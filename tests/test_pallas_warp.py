"""Numerics tests for the fused Pallas stage-B alignment warp.

Runs in Pallas interpret mode on the CPU test mesh (Mosaic only compiles
for TPU). The kernel must match (a) a direct numpy hat-weight evaluation of
the stage-B contraction and (b) the XLA `align_faces_matmul` path it
replaces in `pipeline/engine.RecognitionEngine(align_impl='pallas')`.
"""

import numpy as np

import jax
import jax.numpy as jnp

from facerecognitionpipeline_tpu.ops.pallas_warp import warp_patches_affine
from facerecognitionpipeline_tpu.ops.warp import (
    align_faces_batch_pallas,
    align_faces_matmul,
    reference_template,
    warp_coeffs,
)


def _numpy_stage_b(patches, coeffs, out_h, out_w):
    """out[n,o,c] = sum_v hat(py-v) sum_u hat(px-u) P[n,v,u,c]."""
    n, k, _, c = patches.shape
    xs, ys = np.meshgrid(np.arange(out_w), np.arange(out_h))
    x = xs.reshape(-1).astype(np.float32)
    y = ys.reshape(-1).astype(np.float32)
    out = np.zeros((n, out_h * out_w, c), np.float32)
    ids = np.arange(k, dtype=np.float32)
    for i in range(n):
        a0, a1, a2, b0, b1, b2 = coeffs[i]
        px = a0 * x + a1 * y + a2
        py = b0 * x + b1 * y + b2
        wu = np.maximum(0.0, 1.0 - np.abs(px[:, None] - ids[None, :]))
        wv = np.maximum(0.0, 1.0 - np.abs(py[:, None] - ids[None, :]))
        rows = np.einsum(
            "ou,vuc->ovc", wu, patches[i].astype(np.float32)
        )
        out[i] = np.einsum("ov,ovc->oc", wv, rows)
    return out.reshape(n, out_h, out_w, c)


def test_kernel_matches_numpy_reference(rng):
    n, k, c, oh, ow = 3, 16, 3, 8, 8
    patches = rng.uniform(0, 255, size=(n, k, k, c)).astype(np.float32)
    # Random mild affines mapping the 8x8 output into patch space, plus one
    # that samples out of bounds (hat weights -> zero contribution there).
    coeffs = np.stack(
        [
            np.array([1.5, 0.1, 1.0, -0.05, 1.4, 2.0], np.float32),
            np.array([0.9, -0.2, 4.0, 0.15, 1.1, 0.5], np.float32),
            np.array([2.0, 0.0, -6.0, 0.0, 2.0, -6.0], np.float32),
        ]
    )
    got = np.asarray(
        warp_patches_affine(
            jnp.asarray(patches), jnp.asarray(coeffs), oh, ow, tile=32
        )
    )
    want = _numpy_stage_b(patches, coeffs, oh, ow)
    # Kernel runs the rows matmul in bf16 (f32 accumulate).
    np.testing.assert_allclose(got, want, atol=1.0, rtol=2e-2)


def test_kernel_odd_tile_padding(rng):
    """Output size not divisible by the tile: padded cells must not corrupt."""
    n, k, c, oh, ow = 2, 16, 3, 7, 9  # o=63, tile=40 -> pad to 80
    patches = rng.uniform(0, 255, size=(n, k, k, c)).astype(np.float32)
    coeffs = np.tile(
        np.array([[1.2, 0.05, 0.5, -0.1, 1.3, 1.0]], np.float32), (n, 1)
    )
    got = np.asarray(
        warp_patches_affine(
            jnp.asarray(patches), jnp.asarray(coeffs), oh, ow, tile=40
        )
    )
    want = _numpy_stage_b(patches, coeffs, oh, ow)
    np.testing.assert_allclose(got, want, atol=1.0, rtol=2e-2)


def test_batch_pallas_matches_matmul_alignment(rng):
    """Full alignment: Pallas stage-B == XLA stage-B on shared stage-A patches."""
    b, f, size = 2, 2, 112
    template = jnp.asarray(reference_template(size))
    images = jnp.asarray(
        rng.uniform(0, 255, size=(b, 160, 160, 3)).astype(np.float32)
    )
    # Landmarks: template scaled/rotated/shifted into the image + jitter.
    tpl = np.asarray(template)
    lmks = np.zeros((b, f, 5, 2), np.float32)
    for i in range(b):
        for j in range(f):
            theta = rng.uniform(-0.3, 0.3)
            s = rng.uniform(0.7, 1.2)
            rot = np.array(
                [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
            )
            lmks[i, j] = (tpl - 56.0) @ (s * rot).T + 80.0 + rng.uniform(-8, 8, 2)
    lmks = jnp.asarray(lmks)

    got = np.asarray(
        align_faces_batch_pallas(images, lmks, template, size, patch_size=128)
    )
    want = np.asarray(
        jax.vmap(
            lambda img, lmk: align_faces_matmul(
                img, lmk, template, size, patch_size=128
            )
        )(images, lmks)
    )
    assert got.shape == (b, f, size, size, 3)
    # Same stage A; stage B differs only in accumulation precision (kernel
    # accumulates f32 where the XLA path keeps bf16).
    np.testing.assert_allclose(got, want, atol=2.0, rtol=2e-2)
    assert float(np.mean(np.abs(got - want))) < 0.25
