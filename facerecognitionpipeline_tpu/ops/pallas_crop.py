"""Pallas kernel: fused batched crop+resize from a shared frame.

`ops/warp.crop_resize` runs the separable bilinear resample as two XLA
contractions; the rows pass stacks all boxes into one big MXU matmul, but
the column pass is a per-box batched contraction with tiny output tiles
(N = out*C lanes) AND a [boxes, out, W, C] intermediate that round-trips
HBM. Measured at the detector's stage-3 shape (8 frames x 96 boxes,
48px out of a 640px frame) the whole crop costs ~2.0 ms of which ~1.4 ms
is the column pass + intermediate — every alternative XLA formulation
(batched dot_general, cols-first, explicit transposes) lands within noise
of the same cost, so the fix is fusion, not contraction order.

This kernel keeps the WHOLE frame resident in VMEM (640px bf16 planar =
2.3 MB against ~16 MB VMEM; Pallas re-DMAs it only when the grid moves to
the next frame) and runs both passes per box back to back:

  1. hat weights  wy[o, h] = max(0, 1-|py(o)-h|), wxT[w, o] likewise,
     synthesized from iota + four SMEM box scalars        (VPU, no HBM)
  2. rows = wy @ img_c          [out, W]   one matmul per channel (MXU)
  3. out_c = rows @ wxT         [out, out]                         (MXU)

The only HBM traffic is one frame read per frame (not per box) and the
tiny [out, out, C] outputs. Semantics match `crop_resize` exactly (same
half-pixel hat weights, zero outside the frame, bf16 operands); the rows
intermediate here accumulates f32 where the XLA path keeps bf16, so this
kernel is the slightly MORE precise of the two.

Used by the detector cascade for R/O-net candidate crops
(models/detector.py); replaces the reference's per-box host-side
`cv2.resize` crops (/root/reference/face_detection.py:214-233 pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    box_ref, img_ref, out_ref, *, k: int, c: int, h: int, w: int, g: int
):
    """Grid cell: G boxes of one frame.

    box [G,1,8] f32 SMEM: (x1, y1, x2, y2, _, _, _, _) per box;
    img [1, C, H, W] bf16 (planar, VMEM-resident per frame);
    out [G, C, k, k] f32.

    Grouping G boxes per cell amortizes per-cell overhead AND stacks the
    rows pass into one [G*k, H] matmul (bigger M for the MXU); the column
    pass stays per-box (each box has its own wxT).
    """
    # Row hat weights [G*k, H]: output sample o (sublanes) against source
    # rows (lanes). Half-pixel centers; weights clipped at the frame edge
    # give the same zero-outside mass as crop_resize's _interp_matrix.
    # (Mosaic iota must be integer; cast after, as in pallas_warp.)
    hh = jax.lax.broadcasted_iota(jnp.int32, (k, h), 1).astype(jnp.float32)
    oy = (
        jax.lax.broadcasted_iota(jnp.int32, (k, h), 0).astype(jnp.float32)
        + 0.5
    ) / k
    ww = jax.lax.broadcasted_iota(jnp.int32, (w, k), 0).astype(jnp.float32)
    ox = (
        jax.lax.broadcasted_iota(jnp.int32, (w, k), 1).astype(jnp.float32)
        + 0.5
    ) / k

    wys, wxts = [], []
    for gi in range(g):
        x1 = box_ref[gi, 0, 0]
        y1 = box_ref[gi, 0, 1]
        x2 = box_ref[gi, 0, 2]
        y2 = box_ref[gi, 0, 3]
        bw = jnp.maximum(x2 - x1, 1e-6)
        bh = jnp.maximum(y2 - y1, 1e-6)
        py = y1 + bh * oy - 0.5
        wys.append(jnp.maximum(0.0, 1.0 - jnp.abs(py - hh)))
        # Column hat weights pre-transposed [W, k]: source cols in
        # sublanes, output samples in lanes — the second matmul consumes
        # it directly.
        px = x1 + bw * ox - 0.5
        wxts.append(
            jnp.maximum(0.0, 1.0 - jnp.abs(px - ww)).astype(jnp.bfloat16)
        )
    wy = jnp.concatenate(wys, axis=0).astype(jnp.bfloat16)  # [G*k, H]

    for ci in range(c):
        rows = jnp.dot(wy, img_ref[0, ci], preferred_element_type=jnp.float32)
        rows16 = rows.astype(jnp.bfloat16)
        for gi in range(g):
            out_ref[gi, ci] = jnp.dot(
                rows16[gi * k:(gi + 1) * k], wxts[gi],
                preferred_element_type=jnp.float32,
            )


#: Conservative per-cell VMEM budget (v5e has ~16 MB/core; leave room for
#: double-buffering and the compiler's own scratch).
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _vmem_bytes(img_shape, k: int, g: int) -> int:
    """Rough per-grid-cell VMEM working set of the kernel."""
    _, h, w, c = img_shape
    frame = h * w * c * 2                    # bf16 planar frame, resident
    wy = g * k * h * 2                       # stacked row weights, bf16
    wxt = g * w * k * 2                      # per-box col weights, bf16
    rows = g * k * w * 4                     # f32 rows of the big matmul
    out = g * c * k * k * 4                  # f32 output block
    return frame + wy + wxt + rows + out


def crop_resize_pallas(
    images: jax.Array,
    boxes: jax.Array,
    out_size: int,
    interpret: bool | None = None,
    group: int = 8,
) -> jax.Array:
    """Batched crop+resize: images [B,H,W,C] (or one frame [H,W,C]),
    boxes [B,N,4] / [N,4] (x1,y1,x2,y2 float pixels) ->
    [B,N,out,out,C] / [N,out,out,C] float32, bilinear with half-pixel
    centers and zero outside the frame — `ops/warp.crop_resize` semantics
    on the MXU with no HBM intermediate.

    `interpret=None` auto-selects interpreter mode on CPU backends (Mosaic
    only compiles for TPU). `group`: boxes per grid cell (clamped to a
    divisor of N); 8 amortizes cell overhead at the cascade's budgets.

    Frames too large for the kernel's VMEM working set (the whole frame
    stays resident per grid cell) fall back to the XLA `crop_resize`
    path with bf16 operands — same numerics, no compile failure at big
    det sizes.
    """
    single = images.ndim == 3
    if single:
        images = images[None]
        boxes = boxes[None]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    g = max(1, min(group, boxes.shape[1]))
    while boxes.shape[1] % g:
        g -= 1
    if _vmem_bytes(images.shape, out_size, g) > _VMEM_BUDGET_BYTES:
        from facerecognitionpipeline_tpu.ops.warp import crop_resize

        out = jax.vmap(
            lambda img, bx: crop_resize(
                img, bx, out_size, compute_dtype=jnp.bfloat16
            )
        )(images, boxes)
        return out[0] if single else out
    out = _crop_resize_pallas(
        images, boxes, out_size=out_size, interpret=interpret, group=g
    )
    out = out.transpose(0, 1, 3, 4, 2)  # [B, N, k, k, C]
    return out[0] if single else out


@functools.partial(
    jax.jit, static_argnames=("out_size", "interpret", "group")
)
def _crop_resize_pallas(
    images: jax.Array,
    boxes: jax.Array,
    out_size: int,
    interpret: bool,
    group: int,
):
    b, h, w, c = images.shape
    n = boxes.shape[1]
    k = out_size
    g = group
    cells = n // g  # per frame; caller guarantees divisibility

    imgs_p = images.astype(jnp.bfloat16).transpose(0, 3, 1, 2)  # [B, C, H, W]
    # [B*N, 1, 8]: middle singleton keeps block dims == array dims for the
    # Mosaic SMEM block-shape check (same trick as pallas_warp.coeffs8).
    boxes8 = jnp.pad(
        boxes.astype(jnp.float32).reshape(b * n, 4), ((0, 0), (0, 4))
    )[:, None, :]

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, c=c, h=h, w=w, g=g),
        grid=(b * cells,),
        in_specs=[
            pl.BlockSpec(
                (g, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, c, h, w),
                lambda i: (i // cells, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (g, c, k, k), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * n, c, k, k), jnp.float32),
        interpret=interpret,
    )(boxes8, imgs_p)
    return out.reshape(b, n, c, k, k)
