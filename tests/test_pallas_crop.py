"""Fused Pallas crop+resize kernel: parity with the XLA crop_resize path
(interpret mode on the CPU test mesh) and cascade/DP integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from facerecognitionpipeline_tpu.models.detector import MTCNNDetector
from facerecognitionpipeline_tpu.ops.pallas_crop import crop_resize_pallas
from facerecognitionpipeline_tpu.ops.warp import crop_resize, crop_resize_gather


def _random_boxes(rng, b, n, s):
    x1 = rng.uniform(-5, s - 10, (b, n))
    y1 = rng.uniform(-5, s - 10, (b, n))
    w = rng.uniform(4, s, (b, n))
    h = rng.uniform(4, s, (b, n))
    return np.stack([x1, y1, x1 + w, y1 + h], axis=-1).astype(np.float32)


def test_matches_crop_resize(rng):
    b, n, s, k = 2, 12, 64, 24
    imgs = jnp.asarray(rng.random((b, s, s, 3)).astype(np.float32))
    boxes = jnp.asarray(_random_boxes(rng, b, n, s))
    ref = jnp.stack(
        [
            crop_resize(imgs[i], boxes[i], k, compute_dtype=jnp.bfloat16)
            for i in range(b)
        ]
    )
    out = crop_resize_pallas(imgs, boxes, k)
    assert out.shape == (b, n, k, k, 3)
    np.testing.assert_allclose(out, ref, atol=2e-2)


@pytest.mark.parametrize("group", [1, 3, 4, 12, 7])
def test_group_invariant(rng, group):
    """Every group size produces the same crops (grouping is pure tiling)."""
    b, n, s, k = 1, 12, 48, 16
    imgs = jnp.asarray(rng.random((b, s, s, 3)).astype(np.float32))
    boxes = jnp.asarray(_random_boxes(rng, b, n, s))
    base = crop_resize_pallas(imgs, boxes, k, group=1)
    out = crop_resize_pallas(imgs, boxes, k, group=group)
    np.testing.assert_allclose(out, base, atol=1e-5)


def test_single_frame_api(rng):
    s, n, k = 48, 6, 16
    img = jnp.asarray(rng.random((s, s, 3)).astype(np.float32))
    boxes = jnp.asarray(_random_boxes(rng, 1, n, s)[0])
    out1 = crop_resize_pallas(img, boxes, k)
    out2 = crop_resize_pallas(img[None], boxes[None], k)[0]
    assert out1.shape == (n, k, k, 3)
    np.testing.assert_allclose(out1, out2, atol=0)


def test_zero_outside_frame(rng):
    """Boxes hanging off the frame get zero contribution outside (same
    border semantics as the gather reference)."""
    s, k = 32, 8
    img = jnp.ones((s, s, 3), jnp.float32)
    boxes = jnp.asarray([[-8.0, -8.0, 8.0, 8.0]], jnp.float32)
    out = crop_resize_pallas(img, boxes, k)
    gold = crop_resize_gather(img, boxes, k)
    np.testing.assert_allclose(out, gold, atol=2e-2)
    assert float(out[0, 0, 0, 0]) == 0.0  # fully outside corner


def test_cascade_crop_impl_parity(rng):
    """crop_impl='pallas' and 'matmul' cascades agree on detections for the
    shipped trained weights (bf16 compute both sides)."""
    kw = dict(
        det_size=(160, 160), max_faces=4, min_face_size=40, dtype=jnp.bfloat16
    )
    det_m = MTCNNDetector(crop_impl="matmul", **kw)
    det_p = MTCNNDetector(crop_impl="pallas", **kw)
    assert det_p.crop_impl == "pallas"

    from facerecognitionpipeline_tpu.train.detector_train import render_scene

    img, boxes, _ = render_scene(
        np.random.default_rng(0), size=160, max_faces=2, min_face=48, max_face=80
    )
    rm = det_m.detect(img)
    rp = det_p.detect(img)
    assert len(rm) == len(rp) and len(rm) >= 1
    for a, b in zip(rm, rp):
        inter_x = min(a["bbox"][2], b["bbox"][2]) - max(a["bbox"][0], b["bbox"][0])
        inter_y = min(a["bbox"][3], b["bbox"][3]) - max(a["bbox"][1], b["bbox"][1])
        assert inter_x > 0 and inter_y > 0
        assert abs(a["det_score"] - b["det_score"]) < 0.05


def test_cascade_pallas_batch(rng):
    """The vmapped batch cascade works with pallas crops (vmap lifts the
    pallas_call grid)."""
    det = MTCNNDetector(
        det_size=(96, 96), max_faces=2, min_face_size=40, dtype=jnp.bfloat16,
        crop_impl="pallas",
    )
    frames = jnp.asarray(
        rng.integers(0, 256, size=(2, 96, 96, 3)).astype(np.uint8)
    )
    out = det.detect_device(frames)
    assert out["bboxes"].shape == (2, 2, 4)


def test_auto_resolves_matmul_on_cpu():
    det = MTCNNDetector(det_size=(96, 96), dtype=jnp.bfloat16)
    assert det.crop_impl == "matmul"  # tests run on the CPU backend
    with pytest.raises(ValueError):
        MTCNNDetector(det_size=(96, 96), crop_impl="nope")


def test_dp_engine_pallas_crops_under_mesh(rng):
    """A pallas-crop detector under a DP mesh (shard_map-wrapped cascade)
    matches the single-device engine."""
    from facerecognitionpipeline_tpu.gallery.search import DeviceGallery
    from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder
    from facerecognitionpipeline_tpu.pipeline.engine import RecognitionEngine

    detector = MTCNNDetector(
        det_size=(160, 160), max_faces=4, min_face_size=40,
        dtype=jnp.bfloat16, crop_impl="pallas",
    )
    embedder = FaceEmbedder(architecture="ir_micro")
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), axis_names=("data",))

    single = RecognitionEngine(detector, embedder, top_k=2)
    sharded = RecognitionEngine(detector, embedder, top_k=2, mesh=mesh)

    dg = DeviceGallery()
    t = rng.normal(size=(6, 512)).astype(np.float32)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    dg.rebuild([f"id{i}" for i in range(6)], t)

    frames = rng.integers(0, 256, size=(4, 160, 160, 3), dtype=np.uint8)
    a = jax.device_get(single.process_frames(frames, dg._templates, dg._valid, 2))
    b = jax.device_get(sharded.process_frames(frames, dg._templates, dg._valid, 2))

    np.testing.assert_array_equal(a["face_valid"], b["face_valid"])
    np.testing.assert_allclose(a["match_scores"], b["match_scores"], atol=1e-4)
    np.testing.assert_allclose(a["embeddings"], b["embeddings"], atol=1e-4)


def test_vmem_fallback_large_frame(rng):
    """Frames past the kernel's VMEM budget fall back to the XLA path
    (same numerics) instead of failing to compile."""
    from facerecognitionpipeline_tpu.ops import pallas_crop

    shape = (1, 1280, 1280, 3)
    assert pallas_crop._vmem_bytes(shape, 128, 8) > pallas_crop._VMEM_BUDGET_BYTES
    # exercise the fallback end-to-end on a (small) frame by shrinking the
    # budget so the dispatch logic routes through crop_resize
    old = pallas_crop._VMEM_BUDGET_BYTES
    try:
        pallas_crop._VMEM_BUDGET_BYTES = 1
        img = jnp.asarray(rng.random((1, 48, 48, 3)).astype(np.float32))
        boxes = jnp.asarray(_random_boxes(rng, 1, 4, 48))
        out = crop_resize_pallas(img, boxes, 16)
    finally:
        pallas_crop._VMEM_BUDGET_BYTES = old
    ref = crop_resize(img[0], boxes[0], 16, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(out[0], ref, atol=1e-5)


def test_pallas_requires_bf16():
    with pytest.raises(ValueError, match="bfloat16"):
        MTCNNDetector(det_size=(96, 96), crop_impl="pallas", dtype=jnp.float32)


def test_align_pallas_honors_compute_dtype(rng):
    """compute_dtype=f32 must not be silently downgraded to the bf16
    kernel path."""
    from facerecognitionpipeline_tpu.ops.warp import (
        align_faces_batch_pallas, align_faces_matmul, reference_template)

    tpl = jnp.asarray(reference_template(112))
    img = jnp.asarray(rng.random((1, 160, 160, 3)).astype(np.float32) * 255)
    lmk = jnp.asarray(
        (np.asarray(tpl)[None, None] * 0.8 + 20.0).astype(np.float32))
    a = align_faces_batch_pallas(img, lmk, tpl, 112, compute_dtype=jnp.float32)
    b = jax.vmap(
        lambda i, l: align_faces_matmul(i, l, tpl, 112)
    )(img, lmk)
    # stage B differs by implementation (pallas kernel vs matmul warp);
    # agreement within ~1 intensity level on 0-255 confirms stage A ran
    # in f32 rather than the bf16 kernel
    np.testing.assert_allclose(a, b, atol=1.5)
