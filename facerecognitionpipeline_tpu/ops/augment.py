"""Batched enrollment augmentation: all variants of all faces in one kernel.

Mirrors the reference's per-face cv2 augmentation recipe
(`augment_face_for_enrollment`, enroll_students.py:20-48) — original, h-flip,
rotations ±5°/±10° (replicate border), brightness ±10/±20, contrast
0.85/0.92/1.08/1.15, 3x3 Gaussian blur sigma 0.5, Gaussian noise sigma 3 — as
ONE vectorized device op over the whole face batch: [N,H,W,3] -> [N,A,H,W,3].
Variant ordering matches the reference so `num_augmentations=8` selects the
same subset (orig, flip, 4 rotations, brightness -20/-10).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from facerecognitionpipeline_tpu.ops.warp import bilinear_sample

ROTATION_ANGLES = (-10.0, -5.0, 5.0, 10.0)
BRIGHTNESS_DELTAS = (-20.0, -10.0, 10.0, 20.0)
CONTRAST_FACTORS = (0.85, 0.92, 1.08, 1.15)
NUM_VARIANTS = 2 + len(ROTATION_ANGLES) + len(BRIGHTNESS_DELTAS) + len(CONTRAST_FACTORS) + 2

# cv2.getGaussianKernel(3, 0.5)
_GAUSS3 = (0.10650698, 0.78698604, 0.10650698)


def _rotate(image: jax.Array, angle_deg: float) -> jax.Array:
    """Rotate one [H,W,C] image about its center (cv2.getRotationMatrix2D
    convention: positive = counter-clockwise, integer-div center), replicate
    border."""
    h, w, _ = image.shape
    cx, cy = w // 2, h // 2
    a = math.radians(angle_deg)
    cos_a, sin_a = math.cos(a), math.sin(a)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    # inverse map (dst -> src): rotate by -angle in cv2's y-down frame
    dx, dy = gx - cx, gy - cy
    sx = cos_a * dx - sin_a * dy + cx
    sy = sin_a * dx + cos_a * dy + cy
    return bilinear_sample(image, sx, sy, border="replicate")


def _gaussian_blur3(images: jax.Array) -> jax.Array:
    """Separable 3x3 Gaussian (sigma 0.5), reflect-101 border, [...,H,W,C]."""
    k = jnp.asarray(_GAUSS3, jnp.float32)
    x = jnp.pad(
        images,
        [(0, 0)] * (images.ndim - 3) + [(1, 1), (0, 0), (0, 0)],
        mode="reflect",
    )
    x = k[0] * x[..., :-2, :, :] + k[1] * x[..., 1:-1, :, :] + k[2] * x[..., 2:, :, :]
    x = jnp.pad(
        x, [(0, 0)] * (images.ndim - 3) + [(0, 0), (1, 1), (0, 0)], mode="reflect"
    )
    return k[0] * x[..., :, :-2, :] + k[1] * x[..., :, 1:-1, :] + k[2] * x[..., :, 2:, :]


@partial(jax.jit, static_argnames=("num_augmentations",))
def augment_batch(
    faces: jax.Array, seed: jax.Array, num_augmentations: int = 8
) -> jax.Array:
    """[N,H,W,3] uint8/float RGB -> [N, num_augmentations, H, W, 3] float32.

    Deterministic given `seed` (the noise variant). All variants for all
    faces are produced by one fused program; the reference loops cv2 calls
    per face per variant.
    """
    faces = faces.astype(jnp.float32)
    n = faces.shape[0]
    if not 1 <= num_augmentations <= NUM_VARIANTS:
        raise ValueError(
            f"num_augmentations={num_augmentations} must be in "
            f"[1, {NUM_VARIANTS}] — a silent truncation (or an empty stack) "
            "would enroll fewer augmentations than the caller sized for"
        )
    variants = [faces, faces[:, :, ::-1, :]]  # original, h-flip

    for angle in ROTATION_ANGLES:
        variants.append(jax.vmap(lambda im: _rotate(im, angle))(faces))
    for beta in BRIGHTNESS_DELTAS:
        variants.append(jnp.clip(faces + beta, 0, 255))
    for alpha in CONTRAST_FACTORS:
        variants.append(jnp.clip(faces * alpha, 0, 255))
    variants.append(_gaussian_blur3(faces))
    noise = 3.0 * jax.random.normal(jax.random.PRNGKey(seed), faces.shape)
    variants.append(jnp.clip(faces + noise, 0, 255))

    stack = jnp.stack(variants[:num_augmentations], axis=1)
    return jnp.clip(jnp.round(stack), 0, 255)
