"""Tests for image ops: gray conversion, resize, model-input normalization."""

import cv2
import numpy as np

from facerecognitionpipeline_tpu.ops.image import (
    normalize_face_batch,
    preprocess_faces,
    resize_bilinear,
    rgb_to_gray,
)


def test_rgb_to_gray_matches_cv2(rng):
    imgs = rng.integers(0, 256, size=(2, 50, 60, 3), dtype=np.uint8)
    ours = np.asarray(rgb_to_gray(imgs))
    for i in range(2):
        golden = cv2.cvtColor(imgs[i], cv2.COLOR_RGB2GRAY).astype(np.float32)
        np.testing.assert_allclose(ours[i], golden, atol=0.51)


def test_resize_matches_cv2_upsample(rng):
    imgs = rng.integers(0, 256, size=(2, 56, 56, 3), dtype=np.uint8)
    ours = np.asarray(resize_bilinear(imgs, 112, 112))
    for i in range(2):
        golden = cv2.resize(
            imgs[i].astype(np.float32), (112, 112), interpolation=cv2.INTER_LINEAR
        )
        np.testing.assert_allclose(ours[i], golden, atol=1e-2, rtol=1e-4)


def test_resize_matches_cv2_downsample(rng):
    """Downscale parity needs antialias=False — jax.image.resize's default
    antialiased triangle kernel diverges from cv2.INTER_LINEAR's fixed 2x2
    sampling exactly when crops are larger than the model input."""
    imgs = rng.integers(0, 256, size=(2, 200, 176, 3), dtype=np.uint8)
    ours = np.asarray(resize_bilinear(imgs, 112, 112))
    for i in range(2):
        golden = cv2.resize(
            imgs[i].astype(np.float32), (112, 112), interpolation=cv2.INTER_LINEAR
        )
        np.testing.assert_allclose(ours[i], golden, atol=1e-2, rtol=1e-4)


def test_normalize_matches_both_reference_formulas(rng):
    faces = rng.integers(0, 256, size=(3, 112, 112, 3), dtype=np.uint8)
    out = np.asarray(normalize_face_batch(faces))
    # AdaFace formula (face_embedder.py:98-103): BGR, (x/255 - 0.5)/0.5
    adaface = (faces[..., ::-1] / 255.0 - 0.5) / 0.5
    # ArcFace formula (face_embedder.py:105-110): BGR, (x - 127.5)/127.5
    arcface = (faces[..., ::-1] - 127.5) / 127.5
    np.testing.assert_allclose(out, adaface, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out, arcface, rtol=1e-5, atol=1e-5)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_preprocess_resizes_larger_inputs(rng):
    faces = rng.integers(0, 256, size=(2, 224, 224, 3), dtype=np.uint8)
    out = np.asarray(preprocess_faces(faces))
    assert out.shape == (2, 112, 112, 3)
    assert out.dtype == np.float32


def test_i420_to_rgb_matches_cv2(rng):
    """Device I420->RGB vs cv2.COLOR_YUV2RGB_I420 on cv2-encoded frames."""
    import cv2

    from facerecognitionpipeline_tpu.ops.image import (
        i420_to_rgb,
        rgb_to_i420_host,
    )

    h, w = 64, 48
    frames = rng.integers(0, 256, size=(3, h, w, 3), dtype=np.uint8)
    yuv = np.stack([rgb_to_i420_host(f) for f in frames])
    assert yuv.shape == (3, h * 3 // 2, w)

    ours = np.asarray(i420_to_rgb(yuv, h, w))
    for i in range(3):
        golden = cv2.cvtColor(yuv[i], cv2.COLOR_YUV2RGB_I420).astype(np.float32)
        diff = np.abs(ours[i] - golden)
        # cv2 uses fixed-point coefficients; ours are the same BT.601
        # constants in float. A couple of levels of quantization skew max.
        assert diff.max() <= 4.0, diff.max()
        assert diff.mean() < 1.0


def test_i420_roundtrip_close_on_smooth_content(rng):
    """RGB -> host I420 -> device RGB stays close where chroma is smooth."""
    from facerecognitionpipeline_tpu.ops.image import (
        i420_to_rgb,
        rgb_to_i420_host,
    )

    h, w = 64, 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frame = np.stack(
        [120 + 60 * np.sin(xx / 17), 100 + 50 * np.cos(yy / 23), xx * 2],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)
    back = np.asarray(i420_to_rgb(rgb_to_i420_host(frame)[None], h, w))[0]
    assert np.abs(back - frame.astype(np.float32)).mean() < 3.0
