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
