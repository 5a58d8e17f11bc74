"""Device-side gallery search: one matmul + top-k, optionally sharded.

Replaces the reference's per-query host loop (`gallery_manager.py:189-205`:
re-vstack all templates, numpy dot, argsort) with an HBM-resident padded
template matrix and a jitted `[Q,512] @ [512,G] -> top_k` program. For large
galleries the template matrix shards across the mesh on the G axis
(`shard_map`), each chip computes its local top-k, and a single small
all-gather merges candidates — the collective rides ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

_EPS = 1e-8
_NEG = -1e9


def _pad_to(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def template_rows(templates) -> int:
    """Row count of a template operand: a plain [G, D] matrix or an
    (int8 [G, D], per-row scales [G]) pair from
    ops.pallas_gallery.quantize_templates."""
    t = templates[0] if isinstance(templates, tuple) else templates
    return t.shape[0]


@partial(jax.jit, static_argnames=("top_k",))
def cosine_topk(
    queries: jax.Array,
    templates: jax.Array,
    valid: jax.Array,
    top_k: int,
) -> tuple[jax.Array, jax.Array]:
    """Top-k cosine matches of normalized queries against padded templates.

    queries [Q,512] (normalized on entry), templates [G,512] (rows for padded
    slots are zero), valid [G] bool. Returns (scores [Q,k], indices [Q,k]).
    """
    q = queries / (jnp.linalg.norm(queries, axis=1, keepdims=True) + _EPS)
    sims = jnp.dot(
        q, templates.T, preferred_element_type=jnp.float32
    )  # [Q, G] — the MXU op
    sims = jnp.where(valid[None, :], sims, _NEG)
    return jax.lax.top_k(sims, top_k)


def _local_topk(q, t, v, top_k: int, streaming: bool, chunk: int):
    """One device's scoring of normalized-ish queries vs its template rows.

    streaming=True runs the fused Pallas streaming kernel (bf16 — or int8
    when `t` is a (codes, scales) pair — template chunks through VMEM,
    running top-k in scratch: HBM traffic is ONE read of the shard, no
    [Q, G] similarity matrix anywhere); False is the plain XLA matmul +
    lax.top_k."""
    if isinstance(t, tuple):
        tq, sc = t
        if streaming:
            from facerecognitionpipeline_tpu.ops.pallas_gallery import (
                streaming_cosine_topk_int8,
            )

            return streaming_cosine_topk_int8(
                q, tq, sc, v, top_k=top_k, chunk=chunk
            )
        qn = q / (jnp.linalg.norm(q, axis=1, keepdims=True) + _EPS)
        sims = jnp.dot(
            qn, tq.astype(jnp.bfloat16).T, preferred_element_type=jnp.float32
        ) * sc[None, :]
        sims = jnp.where(v[None, :], sims, _NEG)
        return jax.lax.top_k(sims, top_k)
    if streaming:
        from facerecognitionpipeline_tpu.ops.pallas_gallery import (
            streaming_cosine_topk,
        )

        return streaming_cosine_topk(q, t, v, top_k=top_k, chunk=chunk)
    qn = q / (jnp.linalg.norm(q, axis=1, keepdims=True) + _EPS)
    sims = jnp.dot(qn, t.T, preferred_element_type=jnp.float32)
    sims = jnp.where(v[None, :], sims, _NEG)
    return jax.lax.top_k(sims, top_k)


def sharded_cosine_topk(
    mesh: Mesh,
    queries: jax.Array,
    templates: jax.Array,
    valid: jax.Array,
    top_k: int,
    axis: str = "gallery",
    streaming: bool = False,
    chunk: int = 4096,
):
    """Gallery-sharded search: templates split on the G axis across `mesh`.

    Each device computes local top-k over its shard, then the [Q, D*k]
    candidate set (tiny) is all-gathered and reduced to the global top-k.
    Communication: D*k scores+indices per query instead of G similarities.
    streaming=True scores each shard with the Pallas streaming kernel
    (pallas_call runs per shard inside shard_map — the partitioner cannot
    split it, but it doesn't need to).
    """
    n_dev = mesh.shape[axis]
    g = template_rows(templates)
    assert g % n_dev == 0, "pad gallery to a multiple of the mesh axis"
    shard = g // n_dev
    if top_k > shard:
        # the local top-k runs over one shard's rows; a larger k would die
        # inside lax.top_k with an opaque shape error mid-trace
        raise ValueError(
            f"top_k={top_k} exceeds the per-device shard of {shard} rows "
            f"({g} padded rows over {n_dev} devices); lower top_k or use "
            f"fewer shards"
        )
    if streaming and shard % chunk:
        raise ValueError(
            f"streaming shards need rows % chunk == 0, got {shard} rows "
            f"per device with chunk {chunk}"
        )
    # NOTE: like cosine_topk, results may include PADDED slots (score
    # _NEG=-1e9) when top_k exceeds the number of VALID rows — callers
    # resolving indices against an id list must bounds-check (the engine
    # resolves via gallery_ids snapshots, serve/server.py, which does).

    def local(q, t, v):
        s, i = _local_topk(q, t, v, top_k, streaming, chunk)
        base = jax.lax.axis_index(axis) * shard
        s = jax.lax.all_gather(s, axis, axis=1, tiled=True)  # [Q, D*k]
        i = jax.lax.all_gather(i + base, axis, axis=1, tiled=True)
        gs, gi = jax.lax.top_k(s, top_k)
        return gs, jnp.take_along_axis(i, gi, axis=1)

    tspec = (
        (P(axis, None), P(axis)) if isinstance(templates, tuple)
        else P(axis, None)
    )
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), tspec, P(axis)),
        out_specs=(P(), P()),
        # outputs are replicated by the tiled all_gather; the static VMA
        # check can't see through top_k, so disable it.
        check_vma=False,
    )
    return fn(queries, templates, valid)


def dp_sharded_cosine_topk(
    mesh: Mesh,
    queries: jax.Array,
    templates: jax.Array,
    valid: jax.Array,
    top_k: int,
    axis: str = "data",
    streaming: bool = False,
    chunk: int = 4096,
):
    """Gallery sharding over the SAME axis the query batch shards over.

    The serving composition: frames (and therefore queries) are data-parallel
    over `axis`, and the template matrix — the tensor that actually stresses
    HBM at production identity counts — is row-sharded over that axis too, so
    gallery capacity and gallery-read bandwidth both scale with the mesh
    instead of replicating G rows onto every chip (`sharded_cosine_topk`
    above shards G but replicates the queries; this variant is the one the
    fused engine uses under `shard_gallery=True`).

    Per chip: all-gather the (small: Q x d) normalized queries over ICI,
    score them against the local template shard, take a local top-k, then
    all-gather the (tiny: Q x n_dev*k) candidate set, merge, and keep the
    rows of this chip's own queries. Communication per step is Q*d + 2*Q*n*k
    numbers — independent of G.

    queries [B, F, d] sharded on B over `axis` (host/global view; shard_map
    splits it), templates [G, d] rows sharded over `axis`, valid [G].
    Returns (scores [B, F, k], indices [B, F, k]) sharded like the queries.
    """
    n_dev = mesh.shape[axis]
    g = template_rows(templates)
    if g % n_dev:
        raise ValueError(
            f"gallery rows ({g}) must divide the mesh '{axis}' axis "
            f"({n_dev}); pad the template matrix (DeviceGallery does)"
        )
    if queries.shape[0] % n_dev:
        raise ValueError(
            f"query batch ({queries.shape[0]}) must divide the mesh "
            f"'{axis}' axis ({n_dev})"
        )
    shard = g // n_dev
    if top_k > shard:
        raise ValueError(
            f"top_k={top_k} exceeds the per-device gallery shard of {shard} "
            f"rows; lower top_k or use fewer shards"
        )
    if streaming and shard % chunk:
        raise ValueError(
            f"streaming shards need rows % chunk == 0, got {shard} rows "
            f"per device with chunk {chunk}"
        )

    def local(qbfd, t, v):
        b_loc, f, d = qbfd.shape
        q = qbfd.reshape(b_loc * f, d)
        qall = jax.lax.all_gather(q, axis, axis=0, tiled=True)  # [Q, d]
        s, i = _local_topk(
            qall, t, v, top_k, streaming, chunk
        )  # local candidates [Q, k]
        base = jax.lax.axis_index(axis) * shard
        s = jax.lax.all_gather(s, axis, axis=1, tiled=True)  # [Q, n*k]
        i = jax.lax.all_gather(i + base, axis, axis=1, tiled=True)
        gs, gi = jax.lax.top_k(s, top_k)
        gidx = jnp.take_along_axis(i, gi, axis=1)
        # every chip computed the merge for ALL queries (trivial: Q x n*k);
        # keep the block belonging to this chip's own frames
        start = jax.lax.axis_index(axis) * (b_loc * f)
        gs = jax.lax.dynamic_slice_in_dim(gs, start, b_loc * f, 0)
        gidx = jax.lax.dynamic_slice_in_dim(gidx, start, b_loc * f, 0)
        return (
            gs.reshape(b_loc, f, top_k),
            gidx.reshape(b_loc, f, top_k),
        )

    tspec = (
        (P(axis, None), P(axis)) if isinstance(templates, tuple)
        else P(axis, None)
    )
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None, None), tspec, P(axis)),
        out_specs=(P(axis, None, None), P(axis, None, None)),
        # the static VMA check can't see through top_k/axis_index
        check_vma=False,
    )
    return fn(queries, templates, valid)


class DeviceGallery:
    """HBM-resident padded template matrix with lazy rebuild.

    Fixes the reference inefficiency of re-stacking gallery templates on
    every query (`gallery_manager.py:194`): the matrix is rebuilt only when
    identities change, padded to a multiple of 128 rows so the matmul tiles
    cleanly onto the MXU and recompilations are rare.

    Galleries at/above `streaming_threshold` identities switch to the Pallas
    streaming kernel (`ops/pallas_gallery.py`): bf16 template chunks are
    double-buffered through VMEM with a fused running top-k, so the [Q,G]
    similarity matrix never materializes in HBM.
    """

    STREAM_CHUNK = 4096

    def __init__(
        self,
        dim: int = 512,
        pad_multiple: int = 128,
        streaming_threshold: int = 32768,
        mesh: Mesh | None = None,
        shard_axis: str = "data",
        quantize: str | None = None,
    ):
        """mesh: optional — row-shard the template matrix over `shard_axis`
        (NamedSharding), so gallery HBM capacity and read bandwidth scale
        with the mesh. Padding rises to a multiple of n_dev * pad_multiple
        (each shard stays MXU-tile aligned); `search` merges per-shard
        top-k candidates over ICI (`sharded_cosine_topk`), and the fused
        engine consumes the same sharded arrays via `dp_sharded_cosine_topk`
        (engine `shard_gallery=True`). The Pallas streaming path is
        single-device-only and is not used under a mesh.
        quantize: None or 'int8' — at streaming scale the device copy
        becomes int8 codes + per-row f32 scales instead of bf16, halving
        gallery HBM bytes again (the streaming kernel is HBM-read bound).
        Top-1 decisions match bf16 (tests/test_pallas_gallery.py); below
        the streaming threshold the flag is inert (dense f32 matmul)."""
        if quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode {quantize!r}")
        self.quantize = quantize
        self.dim = dim
        self.pad_multiple = pad_multiple
        self.streaming_threshold = streaming_threshold
        self.mesh = mesh
        self.shard_axis = shard_axis
        if mesh is not None and shard_axis not in mesh.shape:
            raise ValueError(
                f"mesh has no '{shard_axis}' axis (axes: {dict(mesh.shape)})"
            )
        # One generation of the gallery = one immutable tuple, swapped with a
        # single (atomic, GIL-protected) attribute assignment. Readers take
        # ONE read of _state and use only that tuple, so a concurrent
        # rebuild can never hand them new ids paired with old templates —
        # the index-shift mislabeling field-by-field assignment allowed.
        self._state: tuple[list[str], jax.Array | None, jax.Array | None,
                           jax.Array | None] = ([], None, None, None)

    def rebuild(self, ids: list[str], templates: np.ndarray) -> None:
        """ids: G identity keys; templates: [G, dim] float32."""
        g = len(ids)
        streaming = g >= self.streaming_threshold
        # streaming needs rows % chunk == 0 (per shard under a mesh)
        multiple = self.STREAM_CHUNK if streaming else self.pad_multiple
        if self.mesh is not None:
            # each of the n_dev row shards stays chunk/tile aligned
            multiple *= self.mesh.shape[self.shard_axis]
        gp = max(_pad_to(g, multiple), multiple)
        mat = np.zeros((gp, self.dim), dtype=np.float32)
        val = np.zeros((gp,), dtype=bool)
        if g:
            mat[:g] = templates
            val[:g] = True
        if self.mesh is None:
            t = jnp.asarray(mat)
            v = jnp.asarray(val)
        else:
            from jax.sharding import NamedSharding

            t = jax.device_put(
                mat, NamedSharding(self.mesh, P(self.shard_axis, None))
            )
            v = jax.device_put(
                val, NamedSharding(self.mesh, P(self.shard_axis))
            )
        # the compact copy inherits t's sharding (elementwise/rowwise ops
        # preserve placement): bf16 halves gallery HBM reads at streaming
        # scale; quantize='int8' halves them AGAIN (codes + per-row scales)
        if not streaming:
            compact = None
        elif self.quantize == "int8":
            from facerecognitionpipeline_tpu.ops.pallas_gallery import (
                quantize_templates,
            )

            compact = quantize_templates(t)
        else:
            compact = t.astype(jnp.bfloat16)
        self._state = (
            list(ids),
            t,
            v,
            compact,
        )

    def snapshot(self):
        """(ids, templates, valid, templates_bf16) of ONE generation."""
        return self._state

    # Field views over the current generation (prefer snapshot() when more
    # than one of these is needed — separate property reads can straddle a
    # concurrent rebuild).
    @property
    def _ids(self) -> list[str]:
        return self._state[0]

    @property
    def _templates(self):
        return self._state[1]

    @property
    def _valid(self):
        return self._state[2]

    @property
    def _templates_bf16(self):
        return self._state[3]

    @property
    def size(self) -> int:
        return len(self._state[0])

    def search(
        self, queries: np.ndarray | jax.Array, top_k: int = 5
    ) -> tuple[np.ndarray, list[list[str]]]:
        """queries [Q,dim] -> (scores [Q,k] f32, ids [Q][k]).

        k is clipped to the number of enrolled identities.
        """
        # 2-D BEFORE the empty-gallery return: len() of a 1-D query counts
        # its 512 components as "queries" and would fabricate 512 empty
        # result rows for what the populated path treats as ONE query
        q = jnp.atleast_2d(jnp.asarray(queries, dtype=jnp.float32))
        # one _state read: everything below uses this single generation
        ids_list, templates, valid, templates_bf16 = self._state
        if not ids_list:
            return np.zeros((q.shape[0], 0), np.float32), [
                [] for _ in range(q.shape[0])
            ]
        k = min(top_k, len(ids_list))
        if (
            self.mesh is not None
            and k <= templates.shape[0] // self.mesh.shape[self.shard_axis]
        ):
            # per-shard top-k + tiny ICI candidate merge; never materializes
            # a [Q, G] similarity row across shards on one chip. At
            # streaming scale each shard runs the Pallas streaming kernel
            # on its bf16 rows inside the shard_map. (k larger than a shard
            # — only possible at toy sizes — falls through to the dense
            # path, which GSPMD partitions correctly.)
            streaming = templates_bf16 is not None
            scores, idx = sharded_cosine_topk(
                self.mesh, q,
                templates_bf16 if streaming else templates,
                valid, k, axis=self.shard_axis,
                streaming=streaming, chunk=self.STREAM_CHUNK,
            )
        elif isinstance(templates_bf16, tuple):
            from facerecognitionpipeline_tpu.ops.pallas_gallery import (
                streaming_cosine_topk_int8,
            )

            tq, sc = templates_bf16
            scores, idx = streaming_cosine_topk_int8(
                q, tq, sc, valid, top_k=k, chunk=self.STREAM_CHUNK,
            )
        elif templates_bf16 is not None:
            from facerecognitionpipeline_tpu.ops.pallas_gallery import (
                streaming_cosine_topk,
            )

            scores, idx = streaming_cosine_topk(
                q, templates_bf16, valid, top_k=k,
                chunk=self.STREAM_CHUNK,
            )
        else:
            scores, idx = cosine_topk(q, templates, valid, k)
        scores = np.asarray(scores)
        idx = np.asarray(idx)
        ids = [[ids_list[j] for j in row] for row in idx]
        return scores, ids
