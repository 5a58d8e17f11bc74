"""Pallas kernel: fused stage-B alignment warp (patch -> aligned face).

The MXU alignment warp (`ops/warp.warp_affine_single_matmul`) runs in two
contractions: rows `A[o,v,c] = sum_u wx[o,u] P[v,u,c]` on the MXU, then a
weighted reduce `out[o,c] = sum_v wy[o,v] A[o,v,c]` on the VPU. XLA cannot
fuse two contractions, so the `[faces, O, K, C]` intermediate `A` round-trips
HBM — gigabytes of traffic per bench step (B=8 x 32 faces), which made
alignment ~13 ms of the 59 ms fused step while doing only ~0.3 TFLOP of real
work.

This kernel keeps everything in VMEM per (face, output-tile) grid cell, and
takes the warp as SIX per-face affine coefficients (SMEM scalars) instead of
per-pixel coordinate arrays — sample coords are synthesized from iota on the
VPU, so there are no [N, O] coord tensors in HBM.

LAYOUT: output pixels live in LANES end to end. An aligned face is C=3
channels x O=12544 pixels; a pixel-minor [O, 3] block would use 3 of 128
lanes per store (42x wasted store bandwidth, and XLA pads the buffer
downstream). Instead each grid cell computes a PLANAR [C, tile] block —
every store fills all `tile` lanes — and the patch arrives pre-laid-out as
[(c,v), u] so the rows contraction is one MXU matmul straight into that
layout:

  1. patch-space coords      px[o] = a0*x + a1*y + a2  (x,y from lane iota)
  2. row hat weights         wu[u, o] = max(0, 1-|px[o]-u|)           (VPU)
  3. rows = P_cv @ wu        [C*K, tile] one MXU matmul per tile      (MXU)
  4. col hat weights         wy[v, o] = max(0, 1-|py[o]-v|)           (VPU)
  5. sublane group-reduce:   out[c, o] = sum_v (rows * wy)[c*K+v, o]  (VPU)

The only HBM traffic is one read of the patches and one write of the aligned
faces. Semantics match `warp_affine_single_matmul` stage B (same hat
weights; the rows matmul here accumulates f32 where the XLA path keeps bf16,
so this kernel is the slightly MORE precise of the two); stage A
(`crop_resize`) is shared, so the integer-window snap guarantees identical
lossless behavior for faces that fit the patch.

Reference behavior replaced: per-face `cv2.warpAffine`
(`/root/reference/face_recognition.py:61-75`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(coeff_ref, pt_ref, out_ref, *, k: int, c: int, out_w: int, tile: int):
    """Grid cell: one face x one tile of output pixels (pixels in lanes).

    coeff [1, 1, 8] f32 in SMEM: (a0, a1, a2, b0, b1, b2, _, _);
    pt [1, C*K, K] bf16 (patch as [(c,v), u]); out [1, C, tile] f32.
    """
    t = pl.program_id(1)
    a0 = coeff_ref[0, 0, 0]
    a1 = coeff_ref[0, 0, 1]
    a2 = coeff_ref[0, 0, 2]
    b0 = coeff_ref[0, 0, 3]
    b1 = coeff_ref[0, 0, 4]
    b2 = coeff_ref[0, 0, 5]

    # Output-pixel index o (row-major y*out_w+x) in LANES -> patch coords.
    o = t * tile + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    x = (o % out_w).astype(jnp.float32)
    y = (o // out_w).astype(jnp.float32)
    px = a0 * x + a1 * y + a2  # [1, tile]
    py = b0 * x + b1 * y + b2

    # Hat weights over patch columns (u) / rows (v), pixel ids in sublanes.
    ids = jax.lax.broadcasted_iota(jnp.int32, (k, tile), 0).astype(jnp.float32)
    wu = jnp.maximum(0.0, 1.0 - jnp.abs(px - ids))  # [K, tile]
    rows = jnp.dot(
        pt_ref[0], wu.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )  # [C*K, tile]

    # Sublane group-reduce over v: channel c occupies the contiguous K-row
    # band rows[c*K:(c+1)*K, :], each band reduced against the same wy.
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(py - ids))  # [K, tile]
    for ci in range(c):
        out_ref[0, ci, :] = jnp.sum(
            rows[ci * k:(ci + 1) * k, :] * wy, axis=0
        )


def warp_patches_affine(
    patches: jax.Array,
    coeffs: jax.Array,
    out_h: int,
    out_w: int,
    tile: int = 1792,
    interpret: bool | None = None,
    planar: bool = False,
) -> jax.Array:
    """Stage-B warp of pre-cropped patches along per-face affine maps.

    patches [N, K, K, C] (any float dtype; rows matmul runs bf16),
    coeffs [N, 6] f32 from `ops.warp.warp_coeffs`: patch-space sample
    coords of output pixel (x, y) are px = a0*x+a1*y+a2, py = b0*x+b1*y+b2.
    Returns [N, out_h, out_w, C] float32 (or [N, C, out_h, out_w] when
    `planar=True` — the kernel's native layout, sparing the NHWC relayout
    for consumers that can take channel-planar input), numerically matching
    `warp_affine_single_matmul`'s stage B.

    tile: output pixels per grid cell (multiple of 128; 1792 divides
        112*112 exactly, so the default wastes no padded pixels).
    `interpret=None` auto-selects interpreter mode on CPU backends (Mosaic
    only compiles for TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out = _warp_patches_affine(
        patches, coeffs,
        out_h=out_h, out_w=out_w, tile=tile, interpret=interpret,
    )
    return out if planar else out.transpose(0, 2, 3, 1)


@functools.partial(
    jax.jit, static_argnames=("out_h", "out_w", "tile", "interpret")
)
def _warp_patches_affine(
    patches: jax.Array,
    coeffs: jax.Array,
    out_h: int,
    out_w: int,
    tile: int,
    interpret: bool,
):
    n, k, k2, c = patches.shape
    assert k == k2, "square patches expected"
    o = out_h * out_w
    n_tiles = -(-o // tile)
    o_pad = n_tiles * tile

    # [N, 1, 8]: the middle singleton keeps the (sublane, lane) block dims
    # equal to the array dims, satisfying the Mosaic block-shape check.
    coeffs8 = jnp.pad(coeffs.astype(jnp.float32), ((0, 0), (0, 2)))[:, None, :]

    # Patch -> [(c,v), u] layout: channel-major bands of K contiguous
    # sublanes, so the kernel's rows matmul lands directly in planar layout.
    pt = (
        patches.astype(jnp.bfloat16)
        .transpose(0, 3, 1, 2)  # [n, c, v, u]
        .reshape(n, c * k, k)
    )

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, c=c, out_w=out_w, tile=tile),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 8), lambda i, t: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, c * k, k), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, c, tile), lambda i, t: (i, 0, t), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, c, o_pad), jnp.float32),
        interpret=interpret,
    )(coeffs8, pt)
    return out[:, :, :o].reshape(n, c, out_h, out_w)
