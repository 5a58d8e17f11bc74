"""Pallas kernel: fused streaming gallery search (matmul + running top-k).

For production-scale galleries (10^5-10^6 identities) the [Q,512] x [512,G]
similarity matrix stops fitting comfortably in VMEM and XLA materializes
[Q,G] in HBM before a separate top-k pass. This kernel streams template
chunks through VMEM (the grid pipeline double-buffers the HBM->VMEM copies
automatically), fuses the chunk matmul with a running top-K merge held in
VMEM scratch, and never writes the full similarity matrix anywhere —
HBM traffic is exactly one read of the gallery.

Semantics match `gallery.search.cosine_topk` (queries pre-normalized or not —
normalization is fused; padded slots masked to -1e9). Ties broken toward the
lower index, like lax.top_k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _merge_topk(top_v, top_i, cand_v, cand_i, k: int):
    """Merge candidates into the running top-k (all [Q, *]).

    Gather-free (Mosaic-lowerable): k rounds of row-max + first-occurrence
    one-hot extraction. Ties resolve to the lower index, like lax.top_k.
    """
    v = jnp.concatenate([top_v, cand_v], axis=1)
    i = jnp.concatenate([top_i, cand_i], axis=1)
    new_v = []
    new_i = []
    big = jnp.int32(2 ** 30)
    for _ in range(k):
        m = jnp.max(v, axis=1, keepdims=True)  # [Q, 1]
        is_max = v == m
        # winner = lowest gallery index among the maxima (indices are unique
        # per row, so this selects exactly one entry)
        idx = jnp.min(jnp.where(is_max, i, big), axis=1)
        first = is_max & (i == idx[:, None])
        new_v.append(m[:, 0])
        new_i.append(idx)
        v = jnp.where(first, _NEG, v)
    return jnp.stack(new_v, axis=1), jnp.stack(new_i, axis=1)


def _kernel(q_ref, t_ref, valid_ref, out_v_ref, out_i_ref, acc_v, acc_i, *, k, chunk):
    c = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    @pl.when(c == 0)
    def _():
        acc_v[:] = jnp.full_like(acc_v, _NEG)
        acc_i[:] = jnp.zeros_like(acc_i)

    q = q_ref[:]
    t = t_ref[:]  # [chunk, D]
    sims = jax.lax.dot_general(
        q, t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Q, chunk]
    sims = jnp.where(valid_ref[:].reshape(1, -1) != 0, sims, _NEG)

    base = c * chunk
    cand_i = base + jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    new_v, new_i = _merge_topk(acc_v[:], acc_i[:], sims, cand_i, k)
    acc_v[:] = new_v
    acc_i[:] = new_i

    @pl.when(c == n_chunks - 1)
    def _():
        out_v_ref[:] = acc_v[:]
        out_i_ref[:] = acc_i[:]


def _kernel_int8(
    q_ref, t_ref, scale_ref, valid_ref, out_v_ref, out_i_ref, acc_v, acc_i,
    *, k, chunk
):
    """Int8-template variant: the kernel is HBM-read bound, so int8 rows
    with per-row dequantization scales halve the gallery bytes. The dot
    runs NATIVELY s8 x s8 -> s32 on the MXU (queries are pre-quantized
    per-row by the wrapper — an in-kernel int8->bf16 widen was measured
    10x SLOWER than the bf16 kernel: Mosaic repacks the (32,128)-tiled
    int8 VREGs through the VPU element by element). Both row scales fold
    into the similarity after the matmul:
    sims[i, j] = qscale_i * tscale_j * (qq_i . tq_j)."""
    c = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    @pl.when(c == 0)
    def _():
        acc_v[:] = jnp.full_like(acc_v, _NEG)
        acc_i[:] = jnp.zeros_like(acc_i)

    qq = q_ref[:]          # [Q, D] int8 (pre-quantized, scale in qscale_ref)
    t = t_ref[:]           # [chunk, D] int8
    sims_i32 = jax.lax.dot_general(
        qq, t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [Q, chunk] exact integer dot
    sims = sims_i32.astype(jnp.float32) * scale_ref[:].reshape(1, -1)
    sims = jnp.where(valid_ref[:].reshape(1, -1) != 0, sims, _NEG)

    base = c * chunk
    cand_i = base + jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    new_v, new_i = _merge_topk(acc_v[:], acc_i[:], sims, cand_i, k)
    acc_v[:] = new_v
    acc_i[:] = new_i

    @pl.when(c == n_chunks - 1)
    def _():
        out_v_ref[:] = acc_v[:]
        out_i_ref[:] = acc_i[:]


def quantize_templates(templates) -> tuple[jax.Array, jax.Array]:
    """[G, D] float templates -> (int8 [G, D], per-row f32 scales [G]).

    Symmetric per-row quantization: row j stores round(t_j / s_j) with
    s_j = max|t_j| / 127, so the kernel's dequantized similarity is
    (q . t_q_j) * s_j. For unit-norm 512-d templates max|t| is typically
    0.1-0.3 -> the per-component LSB is ~1e-3 of the row max and the cosine
    error lands well below match-decision margins
    (tests/test_pallas_gallery.py pins top-1 parity vs bf16). Zero rows
    (gallery padding) get scale 1 and all-zero codes."""
    t = jnp.asarray(templates, jnp.float32)
    amax = jnp.max(jnp.abs(t), axis=1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    tq = jnp.clip(jnp.round(t / scale), -127, 127).astype(jnp.int8)
    return tq, scale[:, 0]


def streaming_cosine_topk_int8(
    queries: jax.Array,
    templates_q: jax.Array,
    scales: jax.Array,
    valid: jax.Array,
    top_k: int = 8,
    chunk: int = 2048,
    interpret: bool | None = None,
):
    """Int8-template streaming search: HALF the HBM gallery bytes of the
    bf16 kernel (which is HBM-read bound). queries [Q,D] (normalized
    inside), templates_q int8 [G,D] + scales f32 [G] from
    `quantize_templates`, valid [G] -> (scores [Q,top_k], idx [Q,top_k]).

    Measured (TPU v5e-1, 128 queries x 1.05M ids, k=3, chunk 4096,
    fetch-verified): **1.09-1.16 ms** vs the bf16 kernel's 1.43-2.05 —
    the dot+convert floor sits at the full 818 GB/s HBM rate (the int8
    gallery read is 0.54 GB), with the running k-round merge adding
    ~0.4 ms. Design note: the dot runs natively s8 x s8 -> s32 on the MXU
    with queries pre-quantized per-row OUTSIDE the kernel; an earlier
    variant that widened int8 templates to bf16 in-VMEM measured 10x
    SLOWER than bf16 (Mosaic repacks (32,128)-tiled int8 VREGs through
    the VPU), so do not "simplify" back to astype."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _streaming_cosine_topk_int8(
        queries, templates_q, scales, valid,
        top_k=top_k, chunk=chunk, interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("top_k", "chunk", "interpret"))
def _streaming_cosine_topk_int8(
    queries, templates_q, scales, valid, top_k, chunk, interpret
):
    q, d = queries.shape
    g = templates_q.shape[0]
    assert g % chunk == 0, "pad the gallery to a multiple of the chunk size"
    n_chunks = g // chunk

    # Quantize the (few) queries per-row so the kernel's dot is native
    # s8 x s8 -> s32 on the MXU. The per-query scale is applied to the
    # OUTPUT scores: a positive per-row factor cannot change that row's
    # top-k order, so it needn't enter the kernel's running merge.
    qn = queries / (jnp.linalg.norm(queries, axis=1, keepdims=True) + 1e-8)
    q_amax = jnp.max(jnp.abs(qn), axis=1, keepdims=True)
    q_scale = jnp.where(q_amax > 0, q_amax / 127.0, 1.0)
    qq = jnp.clip(jnp.round(qn / q_scale), -127, 127).astype(jnp.int8)
    valid_i32 = valid.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((q, d), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q, top_k), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, top_k), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((q, top_k), jnp.float32),
            pltpu.VMEM((q, top_k), jnp.int32),
        ],
    )
    kernel = functools.partial(_kernel_int8, k=top_k, chunk=chunk)
    out_v, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q, top_k), jnp.float32),
            jax.ShapeDtypeStruct((q, top_k), jnp.int32),
        ],
        interpret=interpret,
    )(qq, templates_q, scales.astype(jnp.float32), valid_i32)
    # fold the per-query scale back in; keep the invalid-slot sentinel exact
    out_v = jnp.where(out_v <= _NEG, out_v, out_v * q_scale)
    return out_v, out_i


def streaming_cosine_topk(
    queries: jax.Array,
    templates: jax.Array,
    valid: jax.Array,
    top_k: int = 8,
    chunk: int = 2048,
    interpret: bool | None = None,
):
    """queries [Q,D] (rows L2-normalized inside), templates [G,D] (G multiple
    of `chunk`, rows normalized by the caller / zero for padding), valid [G]
    -> (scores [Q,top_k], indices [Q,top_k]).

    `interpret=None` auto-selects interpreter mode on CPU backends (Mosaic
    only compiles for TPU)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _streaming_cosine_topk(
        queries, templates, valid, top_k=top_k, chunk=chunk, interpret=interpret
    )


@functools.partial(jax.jit, static_argnames=("top_k", "chunk", "interpret"))
def _streaming_cosine_topk(
    queries: jax.Array,
    templates: jax.Array,
    valid: jax.Array,
    top_k: int,
    chunk: int,
    interpret: bool,
):
    q, d = queries.shape
    g = templates.shape[0]
    assert g % chunk == 0, "pad the gallery to a multiple of the chunk size"
    n_chunks = g // chunk

    qn = queries / (jnp.linalg.norm(queries, axis=1, keepdims=True) + 1e-8)
    valid_i32 = valid.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((q, d), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q, top_k), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, top_k), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((q, top_k), jnp.float32),
            pltpu.VMEM((q, top_k), jnp.int32),
        ],
    )
    kernel = functools.partial(_kernel, k=top_k, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q, top_k), jnp.float32),
            jax.ShapeDtypeStruct((q, top_k), jnp.int32),
        ],
        interpret=interpret,
    )(qn, templates, valid_i32)
