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
