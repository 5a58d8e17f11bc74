"""Fused recognition-engine step: shape/mask contract on tiny configs."""

import numpy as np
import pytest

from facerecognitionpipeline_tpu.gallery.search import DeviceGallery
from facerecognitionpipeline_tpu.models.detector import MTCNNDetector
from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder
from facerecognitionpipeline_tpu.pipeline.engine import RecognitionEngine


@pytest.fixture(scope="module")
def engine():
    # Weights pinned to the stable base cascade: these tests verify the
    # ENGINE contract (shapes, transports, align impls) on random frames,
    # where a marginal detection near the score threshold can differ
    # between two otherwise-equivalent input paths. Default-weight
    # evolution (e.g. round 5's mtcnn_dr) must not wiggle them.
    import os

    weights = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "pretrained", "mtcnn_synthetic.npz",
    )
    detector = MTCNNDetector(
        det_size=(160, 160), max_faces=4, min_face_size=40,
        weights_path=weights if os.path.exists(weights) else None,
    )
    embedder = FaceEmbedder(architecture="ir_micro")
    return RecognitionEngine(detector, embedder, top_k=2)


def test_full_step_shapes(engine, rng):
    frames = rng.integers(0, 256, size=(2, 160, 160, 3), dtype=np.uint8)
    dg = DeviceGallery()
    t = rng.normal(size=(5, 512)).astype(np.float32)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    dg.rebuild([f"id{i}" for i in range(5)], t)

    out = engine.process_frames(frames, dg._templates, dg._valid, gallery_k=2)
    assert out["bboxes"].shape == (2, 4, 4)
    assert out["embeddings"].shape == (2, 4, 512)
    assert out["match_scores"].shape == (2, 4, 2)
    assert out["match_idx"].shape == (2, 4, 2)
    assert out["aligned"].shape == (2, 4, 112, 112, 3)
    assert out["quality_ok"].shape == (2, 4)
    # embeddings are unit-norm even for padded slots (fixed-shape compute)
    norms = np.linalg.norm(np.asarray(out["embeddings"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # match idx within gallery pad bounds
    assert (np.asarray(out["match_idx"]) >= 0).all()


def test_pallas_align_impl_matches_matmul(engine, rng):
    """engine(align_impl='pallas') == engine(align_impl='matmul') end to end.

    Covers the engine's dispatch into the fused Pallas stage-B warp
    (interpret mode on CPU) — the default path on single-chip TPU via
    align_impl='auto'.
    """
    frames = rng.integers(0, 256, size=(1, 160, 160, 3), dtype=np.uint8)
    dg = DeviceGallery()
    t = rng.normal(size=(5, 512)).astype(np.float32)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    dg.rebuild([f"id{i}" for i in range(5)], t)

    pallas_engine = RecognitionEngine(
        engine.detector, engine.embedder, top_k=2, align_impl="pallas"
    )
    a = engine.process_frames(frames, dg._templates, dg._valid, gallery_k=2)
    b = pallas_engine.process_frames(frames, dg._templates, dg._valid, gallery_k=2)
    # The XLA stage-B accumulates bf16 (+-0.5 absolute at pixel scale 255)
    # where the kernel accumulates f32, so after rounding ~10% of pixels can
    # land one grey level apart — but never more than a couple.
    diff = np.abs(
        np.asarray(a["aligned"], np.float32) - np.asarray(b["aligned"], np.float32)
    )
    assert diff.max() <= 2.0
    assert diff.mean() < 0.3
    np.testing.assert_allclose(
        np.asarray(a["embeddings"]), np.asarray(b["embeddings"]), atol=5e-3
    )
    assert (np.asarray(a["quality_ok"]) == np.asarray(b["quality_ok"])).all()


def test_i420_transport_matches_rgb(engine, rng):
    """engine(input_format='i420') on YUV frames == rgb engine on the
    decoded equivalent — device-side color conversion slots in front of the
    same fused step (halved H2D bytes for serving)."""
    import cv2

    from facerecognitionpipeline_tpu.ops.image import rgb_to_i420_host

    frames = rng.integers(0, 256, size=(1, 160, 160, 3), dtype=np.uint8)
    yuv = np.stack([rgb_to_i420_host(f) for f in frames])
    # What the host-side roundtrip loses (chroma subsample + studio swing)
    # is not under test; feed the rgb engine the cv2-decoded equivalent so
    # only the device-vs-cv2 conversion difference remains.
    decoded = np.stack(
        [cv2.cvtColor(y, cv2.COLOR_YUV2RGB_I420) for y in yuv]
    )

    dg = DeviceGallery()
    t = rng.normal(size=(5, 512)).astype(np.float32)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    dg.rebuild([f"id{i}" for i in range(5)], t)

    yuv_engine = RecognitionEngine(
        engine.detector, engine.embedder, top_k=2, input_format="i420"
    )
    assert yuv_engine.host_frame_shape(160, 160) == (240, 160)
    a = yuv_engine.process_frames(yuv, dg._templates, dg._valid, gallery_k=2)
    b = engine.process_frames(decoded, dg._templates, dg._valid, gallery_k=2)
    assert a["aligned"].shape == b["aligned"].shape
    np.testing.assert_allclose(
        np.asarray(a["bboxes"]), np.asarray(b["bboxes"]), atol=2.0
    )
    np.testing.assert_allclose(
        np.asarray(a["embeddings"]), np.asarray(b["embeddings"]), atol=0.05
    )
