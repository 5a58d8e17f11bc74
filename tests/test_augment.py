"""Augmentation op vs the reference's cv2 recipe."""

import cv2
import numpy as np

from facerecognitionpipeline_tpu.ops.augment import NUM_VARIANTS, augment_batch


def test_variant_count_and_shapes(rng):
    faces = rng.integers(0, 256, size=(3, 112, 112, 3), dtype=np.uint8)
    out = np.asarray(augment_batch(faces, seed=0, num_augmentations=16))
    assert NUM_VARIANTS == 16
    assert out.shape == (3, 16, 112, 112, 3)
    out8 = np.asarray(augment_batch(faces, seed=0, num_augmentations=8))
    assert out8.shape == (3, 8, 112, 112, 3)
    # default-8 subset is the prefix of the full set
    np.testing.assert_array_equal(out8, out[:, :8])


def test_original_and_flip(rng):
    faces = rng.integers(0, 256, size=(2, 64, 64, 3), dtype=np.uint8)
    out = np.asarray(augment_batch(faces, seed=0))
    np.testing.assert_array_equal(out[:, 0], faces.astype(np.float32))
    for i in range(2):
        np.testing.assert_array_equal(
            out[i, 1], cv2.flip(faces[i], 1).astype(np.float32)
        )


def test_rotation_matches_cv2(rng):
    face = rng.integers(0, 256, size=(112, 112, 3), dtype=np.uint8)
    out = np.asarray(augment_batch(face[None], seed=0, num_augmentations=16))[0]
    for slot, angle in zip((2, 3, 4, 5), (-10, -5, 5, 10)):
        center = (face.shape[1] // 2, face.shape[0] // 2)
        m = cv2.getRotationMatrix2D(center, angle, 1.0)
        golden = cv2.warpAffine(
            face.astype(np.float32), m, (112, 112), borderMode=cv2.BORDER_REPLICATE
        )
        # interior agreement (borders differ slightly between samplers)
        diff = np.abs(out[slot, 8:-8, 8:-8] - golden[8:-8, 8:-8])
        assert np.percentile(diff, 99) <= 2.0, f"angle {angle}"


def test_brightness_contrast(rng):
    face = rng.integers(30, 220, size=(32, 32, 3), dtype=np.uint8)
    out = np.asarray(augment_batch(face[None], seed=0, num_augmentations=16))[0]
    np.testing.assert_allclose(
        out[6], np.clip(face.astype(np.float32) - 20, 0, 255), atol=0.5
    )
    np.testing.assert_allclose(
        out[9], np.clip(face.astype(np.float32) + 20, 0, 255), atol=0.5
    )
    np.testing.assert_allclose(
        out[10], np.round(np.clip(face * 0.85, 0, 255)), atol=1.0
    )


def test_blur_and_noise(rng):
    face = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    out = np.asarray(augment_batch(face[None], seed=7, num_augmentations=16))[0]
    golden_blur = cv2.GaussianBlur(face.astype(np.float32), (3, 3), 0.5)
    diff = np.abs(out[14] - golden_blur)
    assert np.percentile(diff, 99) <= 1.5
    # noise variant differs from original but stays close (sigma 3)
    noise_mag = np.abs(out[15] - face.astype(np.float32))
    assert 0.5 < noise_mag.mean() < 6.0
    # deterministic per seed
    out2 = np.asarray(augment_batch(face[None], seed=7, num_augmentations=16))[0]
    np.testing.assert_array_equal(out[15], out2[15])
