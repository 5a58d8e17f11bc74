"""Golden tests for the alignment transform and batched warp vs OpenCV."""

import cv2
import numpy as np

from facerecognitionpipeline_tpu.ops.warp import (
    align_faces,
    invert_affine,
    reference_template,
    similarity_transform,
    warp_affine,
)


def _random_similarity(rng):
    theta = rng.uniform(-0.4, 0.4)
    s = rng.uniform(0.7, 1.4)
    tx, ty = rng.uniform(-20, 20, size=2)
    return np.array(
        [
            [s * np.cos(theta), -s * np.sin(theta), tx],
            [s * np.sin(theta), s * np.cos(theta), ty],
        ],
        dtype=np.float32,
    )


def test_similarity_transform_recovers_exact_map(rng):
    template = reference_template(112).astype(np.float32)
    mats, srcs = [], []
    for _ in range(8):
        m = _random_similarity(rng)
        inv = cv2.invertAffineTransform(m)
        src = (template @ inv[:, :2].T) + inv[:, 2]
        mats.append(m)
        srcs.append(src.astype(np.float32))
    got = np.asarray(similarity_transform(np.stack(srcs), template))
    np.testing.assert_allclose(got, np.stack(mats), rtol=1e-4, atol=1e-3)


def test_similarity_transform_matches_cv2_least_squares(rng):
    """On noisy correspondences we should match estimateAffinePartial2D(LMEDS→LS refine)."""
    template = reference_template(112).astype(np.float32)
    src = template + rng.normal(0, 2.0, size=(5, 2)).astype(np.float32)
    cv2_m, _ = cv2.estimateAffinePartial2D(
        src, template, method=cv2.LMEDS, refineIters=100
    )
    ours = np.asarray(similarity_transform(src[None], template))[0]
    np.testing.assert_allclose(ours, cv2_m, rtol=1e-3, atol=5e-2)


def test_invert_affine(rng):
    m = np.stack([_random_similarity(rng) for _ in range(4)])
    inv = np.asarray(invert_affine(m))
    for i in range(4):
        golden = cv2.invertAffineTransform(m[i])
        np.testing.assert_allclose(inv[i], golden, rtol=1e-4, atol=1e-4)


def test_warp_affine_matches_cv2(rng):
    imgs = rng.integers(0, 256, size=(3, 160, 140, 3), dtype=np.uint8)
    mats = np.stack([_random_similarity(rng) for _ in range(3)])
    ours = np.asarray(warp_affine(imgs, mats, 112, 112))
    for i in range(3):
        golden = cv2.warpAffine(
            imgs[i].astype(np.float32),
            mats[i],
            (112, 112),
            flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT,
            borderValue=0,
        )
        # Interior pixels must match bilinear exactly; cv2 uses 5-bit fixed
        # point interpolation so allow a small absolute tolerance.
        np.testing.assert_allclose(ours[i], golden, atol=1.0)


def test_align_faces_end_to_end(rng):
    """Warping a face back through its own alignment recovers the template layout."""
    template = reference_template(112).astype(np.float32)
    image = rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8)
    m = _random_similarity(rng)
    inv = cv2.invertAffineTransform(m)
    lms = (template @ inv[:, :2].T) + inv[:, 2]

    aligned = np.asarray(
        align_faces(image, lms[None].astype(np.float32), template, 112)
    )
    golden = cv2.warpAffine(
        image.astype(np.float32), m, (112, 112), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    assert aligned.shape == (1, 112, 112, 3)
    np.testing.assert_allclose(aligned[0], golden, atol=1.5)
