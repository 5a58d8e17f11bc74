"""Detector cascade machinery tests (random weights: shapes, masks, coords)."""

import cv2
import numpy as np
import pytest

from facerecognitionpipeline_tpu.models.detector import MTCNNDetector, _square
from facerecognitionpipeline_tpu.ops.warp import crop_resize


@pytest.fixture(scope="module")
def detector():
    return MTCNNDetector(det_size=(160, 160), max_faces=8, min_face_size=20)


def test_crop_resize_matches_cv2(rng):
    img = rng.integers(0, 256, size=(100, 120, 3), dtype=np.uint8)
    boxes = np.array([[10, 20, 58, 68], [0, 0, 50, 50]], np.float32)
    crops = np.asarray(crop_resize(img.astype(np.float32), boxes, 24))
    for i, (x1, y1, x2, y2) in enumerate(boxes.astype(int)):
        golden = cv2.resize(
            img[y1:y2, x1:x2].astype(np.float32), (24, 24),
            interpolation=cv2.INTER_LINEAR,
        )
        np.testing.assert_allclose(crops[i], golden, atol=1.0)


def test_square_boxes():
    boxes = np.array([[0, 0, 10, 20], [5, 5, 25, 15]], np.float32)
    sq = np.asarray(_square(boxes))
    w = sq[:, 2] - sq[:, 0]
    h = sq[:, 3] - sq[:, 1]
    np.testing.assert_allclose(w, h)
    np.testing.assert_allclose(w, [20, 20])
    # centers preserved
    np.testing.assert_allclose((sq[:, 0] + sq[:, 2]) / 2, [5, 15])


def test_cascade_output_schema(detector, rng):
    frame = rng.integers(0, 256, size=(160, 160, 3), dtype=np.uint8)
    out = detector._detect_one(detector.variables, frame.astype(np.float32))
    assert out["bboxes"].shape == (8, 4)
    assert out["scores"].shape == (8,)
    assert out["landmarks"].shape == (8, 5, 2)
    assert out["valid"].shape == (8,)
    scores = np.asarray(out["scores"])
    valid = np.asarray(out["valid"])
    # invalid slots report score 0
    assert (scores[~valid] == 0).all()
    # boxes are clipped to the frame
    b = np.asarray(out["bboxes"])
    assert (b >= 0).all() and (b <= 159).all()


def test_detect_batch_shapes(detector, rng):
    frames = rng.integers(0, 256, size=(2, 160, 160, 3), dtype=np.uint8)
    out = detector.detect_device(frames.astype(np.float32))
    assert out["bboxes"].shape == (2, 8, 4)
    assert out["valid"].shape == (2, 8)


def test_detect_host_api(detector, rng):
    image = rng.integers(0, 256, size=(200, 300, 3), dtype=np.uint8)
    faces = detector.detect(image)
    assert isinstance(faces, list)
    for f in faces:
        assert set(f) >= {"bbox", "landmarks", "det_score"}
        assert f["bbox"].dtype == np.int32
        assert f["landmarks"].shape == (5, 2)
    scores = [f["det_score"] for f in faces]
    assert scores == sorted(scores, reverse=True)


def test_npz_weight_roundtrip(detector, tmp_path, rng):
    path = str(tmp_path / "det.npz")
    detector.save_npz(path)
    det2 = MTCNNDetector(det_size=(160, 160), max_faces=8, weights_path=path)
    frame = rng.integers(0, 256, size=(160, 160, 3), dtype=np.uint8).astype(np.float32)
    a = detector._detect_one(detector.variables, frame)
    b = det2._detect_one(det2.variables, frame)
    np.testing.assert_allclose(np.asarray(a["scores"]), np.asarray(b["scores"]), atol=1e-6)


def test_torch_statedict_import(rng):
    """Public-layout MTCNN torch statedicts convert and run."""
    import torch

    from facerecognitionpipeline_tpu.models.detector_nets import (
        ONet, PNet, RNet, load_mtcnn_torch_statedict,
    )

    torch.manual_seed(0)

    def t(*shape):
        return torch.randn(*shape) * 0.1

    pnet_sd = {
        "conv1.weight": t(10, 3, 3, 3), "conv1.bias": t(10), "prelu1.weight": t(10),
        "conv2.weight": t(16, 10, 3, 3), "conv2.bias": t(16), "prelu2.weight": t(16),
        "conv3.weight": t(32, 16, 3, 3), "conv3.bias": t(32), "prelu3.weight": t(32),
        "conv4_1.weight": t(2, 32, 1, 1), "conv4_1.bias": t(2),
        "conv4_2.weight": t(4, 32, 1, 1), "conv4_2.bias": t(4),
    }
    rnet_sd = {
        "conv1.weight": t(28, 3, 3, 3), "conv1.bias": t(28), "prelu1.weight": t(28),
        "conv2.weight": t(48, 28, 3, 3), "conv2.bias": t(48), "prelu2.weight": t(48),
        "conv3.weight": t(64, 48, 2, 2), "conv3.bias": t(64), "prelu3.weight": t(64),
        "dense4.weight": t(128, 576), "dense4.bias": t(128), "prelu4.weight": t(128),
        "dense5_1.weight": t(2, 128), "dense5_1.bias": t(2),
        "dense5_2.weight": t(4, 128), "dense5_2.bias": t(4),
    }
    onet_sd = {
        "conv1.weight": t(32, 3, 3, 3), "conv1.bias": t(32), "prelu1.weight": t(32),
        "conv2.weight": t(64, 32, 3, 3), "conv2.bias": t(64), "prelu2.weight": t(64),
        "conv3.weight": t(64, 64, 3, 3), "conv3.bias": t(64), "prelu3.weight": t(64),
        "conv4.weight": t(128, 64, 2, 2), "conv4.bias": t(128), "prelu4.weight": t(128),
        "dense5.weight": t(256, 1152), "dense5.bias": t(256), "prelu5.weight": t(256),
        "dense6_1.weight": t(2, 256), "dense6_1.bias": t(2),
        "dense6_2.weight": t(4, 256), "dense6_2.bias": t(4),
        "dense6_3.weight": t(10, 256), "dense6_3.bias": t(10),
    }
    variables = load_mtcnn_torch_statedict(
        {"pnet": pnet_sd, "rnet": rnet_sd, "onet": onet_sd}
    )
    x24 = rng.normal(size=(2, 24, 24, 3)).astype(np.float32)
    x48 = rng.normal(size=(2, 48, 48, 3)).astype(np.float32)
    x12 = rng.normal(size=(1, 12, 12, 3)).astype(np.float32)
    prob, reg = PNet().apply(variables["pnet"], x12)
    assert prob.shape == (1, 1, 1) and reg.shape == (1, 1, 1, 4)
    prob, reg = RNet().apply(variables["rnet"], x24)
    assert prob.shape == (2,) and reg.shape == (2, 4)
    prob, reg, lmk = ONet().apply(variables["onet"], x48)
    assert prob.shape == (2,) and lmk.shape == (2, 5, 2)


def test_rnet_downscaled_crops_exact_on_nondivisible_size(rng):
    """Half-res R-net crop positions must stay exact when the downscale
    factor does NOT divide the frame size (regression: boxes were scaled by
    1/d instead of the true small-frame factor S/h, drifting ~1 px at the
    edges of a 321px frame). On a linear ramp, bilinear downsampling is
    value-preserving, so crops from the half-res source must match full-res
    crops almost exactly if and only if the coordinates are right."""
    import jax.numpy as jnp

    from facerecognitionpipeline_tpu.models.detector import MTCNNDetector

    h = w = 321  # 321 // 2 = 160, true scale 2.00625 != 2
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([xx / w, yy / h, (xx + yy) / (h + w)], axis=-1) * 2 - 1

    boxes = np.array(
        [
            [10.0, 12.0, 90.0, 92.0],
            [200.0, 180.0, 310.0, 290.0],  # near the far edge: max drift
            [100.0, 5.0, 220.0, 125.0],
        ],
        np.float32,
    )
    det = MTCNNDetector(det_size=(h, w), max_faces=4, min_face_size=40)

    def crops_with(dscale):
        det.rnet_crop_downscale = dscale
        scores = jnp.zeros(len(boxes))
        valid = jnp.ones(len(boxes), bool)
        # _stage2 crops first; grab them by calling crop path pieces directly
        import jax

        def run(img_j, bx):
            from facerecognitionpipeline_tpu.models.detector import _square
            from facerecognitionpipeline_tpu.ops.warp import crop_resize

            sq = jnp.clip(_square(bx), 0, max(h, w))
            if dscale > 1:
                s = max(h, w) // dscale
                small = crop_resize(
                    img_j,
                    jnp.array([[0.0, 0.0, float(w), float(h)]], jnp.float32),
                    s,
                )[0]
                sx, sy = s / float(w), s / float(h)
                return crop_resize(
                    small, sq * jnp.array([sx, sy, sx, sy], jnp.float32), 24
                )
            return crop_resize(img_j, sq, 24)

        return np.asarray(jax.jit(run)(jnp.asarray(img), jnp.asarray(boxes)))

    full = crops_with(1)
    half = crops_with(2)
    # exact coordinates + ramp source -> near-exact values (f32 rounding only)
    assert np.abs(full - half).max() < 5e-3


def test_default_weight_autodiscovery():
    """No-arg construction finds the shipped pretrained weights; "random"
    opts out explicitly (used by the trainer)."""
    from facerecognitionpipeline_tpu.models.detector import discover_default_weights

    path = discover_default_weights()
    assert path is not None and path.endswith(".npz")

    det = MTCNNDetector(det_size=(160, 160), max_faces=4, min_face_size=40)
    assert det.pretrained

    det_rand = MTCNNDetector(
        det_size=(160, 160), max_faces=4, min_face_size=40, weights_path="random"
    )
    assert not det_rand.pretrained


def test_constructor_rejects_inverted_candidate_budgets():
    """max_faces > stage2_keep would crash with an opaque lax.top_k trace
    error at first detect; fail at construction instead."""
    with pytest.raises(ValueError, match="candidate budgets"):
        MTCNNDetector(det_size=(160, 160), max_faces=128,
                      weights_path="random")
    with pytest.raises(ValueError, match="candidate budgets"):
        MTCNNDetector(det_size=(160, 160), max_faces=8, stage1_keep=64,
                      stage2_keep=96, weights_path="random")


def test_constructor_rejects_empty_pyramid():
    """min_face_size larger than the detection canvas leaves zero pyramid
    scales -> jnp.concatenate([]) deep inside the first jitted cascade;
    fail at construction with the actual bound."""
    with pytest.raises(ValueError, match="pyramid scale"):
        MTCNNDetector(det_size=(160, 160), min_face_size=200,
                      weights_path="random")
