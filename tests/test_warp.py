"""Golden tests for the alignment transform and batched warp vs OpenCV."""

import cv2
import numpy as np

import jax.numpy as jnp

from facerecognitionpipeline_tpu.ops.warp import (
    align_faces,
    align_faces_matmul,
    invert_affine,
    reference_template,
    similarity_transform,
    warp_affine,
    warp_affine_single,
    warp_affine_single_matmul,
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


def test_warp_matmul_matches_gather_exactly_for_in_patch_faces(rng):
    """Faces whose source extent fits the stage-A patch take a lossless
    integer-window copy, so the MXU warp is exact bilinear of ORIGINAL
    pixels — identical to the gather formulation (and hence to cv2) up to
    float rounding. Hard case on purpose: pure noise image."""
    img = rng.integers(0, 256, size=(320, 320, 3)).astype(np.float32)
    mats = []
    for _ in range(6):
        theta = rng.uniform(-0.4, 0.4)
        s = rng.uniform(1.3, 2.0)  # scale >= 112*1.39/128 => extent fits 128
        tx, ty = rng.uniform(20, 100, size=2)
        mats.append(
            np.array(
                [
                    [s * np.cos(theta), -s * np.sin(theta), tx],
                    [s * np.sin(theta), s * np.cos(theta), ty],
                ],
                np.float32,
            )
        )
    mats = np.stack(mats)
    gather = np.asarray(warp_affine_single(jnp.asarray(img), jnp.asarray(mats), 112, 112))
    mxu = np.asarray(
        warp_affine_single_matmul(
            jnp.asarray(img), jnp.asarray(mats), 112, 112,
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(mxu, gather, atol=0.02)
    # bf16 compute path: pixel-value quantization only (~0.4% of 255)
    mxu_bf16 = np.asarray(
        warp_affine_single_matmul(jnp.asarray(img), jnp.asarray(mats), 112, 112)
    )
    np.testing.assert_allclose(mxu_bf16, gather, atol=2.0)


def test_warp_matmul_cv2_golden_in_patch(rng):
    img = rng.integers(0, 256, size=(240, 300, 3)).astype(np.float32)
    theta, s, tx, ty = 0.25, 1.5, 60.0, 40.0
    m = np.array(
        [
            [s * np.cos(theta), -s * np.sin(theta), tx],
            [s * np.sin(theta), s * np.cos(theta), ty],
        ],
        np.float32,
    )
    ours = np.asarray(
        warp_affine_single_matmul(
            jnp.asarray(img), jnp.asarray(m[None]), 112, 112,
            compute_dtype=jnp.float32,
        )
    )[0]
    golden = cv2.warpAffine(
        img, m, (112, 112), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    np.testing.assert_allclose(ours, golden, atol=1.0)  # cv2 5-bit fixed point


def test_warp_matmul_oversized_faces_bounded(rng):
    """Faces larger than the patch get a two-stage (antialiased) resample:
    not bit-equal to single-pass bilinear, but mean error stays small on
    natural-statistics (smooth) images."""
    img = cv2.GaussianBlur(
        rng.integers(0, 256, size=(320, 320, 3)).astype(np.float32), (9, 9), 3
    )
    theta, s = 0.2, 0.6  # source extent ~ 112/0.6*1.18 ≈ 220 > 128
    m = np.array(
        [
            [s * np.cos(theta), -s * np.sin(theta), 30.0],
            [s * np.sin(theta), s * np.cos(theta), 20.0],
        ],
        np.float32,
    )
    gather = np.asarray(warp_affine_single(jnp.asarray(img), jnp.asarray(m[None]), 112, 112))
    mxu = np.asarray(
        warp_affine_single_matmul(
            jnp.asarray(img), jnp.asarray(m[None]), 112, 112,
            compute_dtype=jnp.float32,
        )
    )
    assert np.abs(mxu - gather).mean() < 1.0
    np.testing.assert_allclose(mxu, gather, atol=60.0)  # localized high-freq spots


def test_align_faces_matmul_matches_align_faces(rng):
    template = reference_template(112).astype(np.float32)
    image = rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8)
    # landmarks of an in-patch face: scale >= 1.3
    theta, s = -0.3, 1.6
    m = np.array(
        [
            [s * np.cos(theta), -s * np.sin(theta), 25.0],
            [s * np.sin(theta), s * np.cos(theta), 35.0],
        ],
        np.float32,
    )
    inv = cv2.invertAffineTransform(m)
    lms = (template @ inv[:, :2].T) + inv[:, 2]
    ref = np.asarray(align_faces(image, lms[None].astype(np.float32), template, 112))
    got = np.asarray(
        align_faces_matmul(
            image, lms[None].astype(np.float32), template, 112,
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(got, ref, atol=0.02)


def test_align_faces_matmul_degenerate_landmarks_are_finite():
    """Padded face slots carry all-zero landmarks; the MXU path must produce
    finite (zero-ish) output, never NaN/Inf."""
    template = reference_template(112).astype(np.float32)
    image = np.full((160, 160, 3), 128, np.float32)
    lms = np.zeros((4, 5, 2), np.float32)
    out = np.asarray(align_faces_matmul(image, lms, template, 112))
    assert np.isfinite(out).all()


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
