"""Core evaluation math: device-batched identity scoring + host statistics.

The reference evaluates identification with a Python triple loop — per probe,
per identity, per gallery embedding cosine (`identify_probe`,
evaluate_models_v2.ipynb cell 5; driver loop temp.py:19-54). Here ALL probes
score against ALL identities in one jitted masked einsum
(`identity_scores_batch`), and rank metrics vectorize over the probe axis.
Score-distribution statistics (d', bootstrap CI) match the notebook's
definitions (cells 6-7).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-8
_NEG = -1e9


def pack_gallery(gallery_embeddings: Dict[str, Dict]) -> tuple:
    """{name: {'embeddings': [M_i, 512]}} -> (names, padded [I, Mmax, 512],
    mask [I, Mmax]). Embeddings are L2-normalized during packing."""
    names = list(gallery_embeddings.keys())
    if not names:
        # fail with the actual cause, not 'max() arg is an empty sequence'
        # deep in the eval stack (empty/failed-to-load gallery pickle,
        # subsampled_gallery n_enrolled=0)
        raise ValueError("pack_gallery: gallery_embeddings is empty")
    mats = [np.atleast_2d(np.asarray(gallery_embeddings[n]["embeddings"],
                                     dtype=np.float32)) for n in names]
    m_max = max(m.shape[0] for m in mats)
    dim = mats[0].shape[1]
    packed = np.zeros((len(names), m_max, dim), np.float32)
    mask = np.zeros((len(names), m_max), bool)
    for i, m in enumerate(mats):
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + _EPS)
        packed[i, : m.shape[0]] = m
        mask[i, : m.shape[0]] = True
    return names, jnp.asarray(packed), jnp.asarray(mask)


@partial(jax.jit, static_argnames=("aggregation", "k"))
def identity_scores_batch(
    probes: jax.Array,
    gallery: jax.Array,
    mask: jax.Array,
    aggregation: str = "mean",
    k: int = 3,
) -> jax.Array:
    """[P,512] probes x [I,M,512] packed gallery -> [P,I] identity scores.

    aggregation: 'max' | 'mean' | 'topk' over each identity's gallery
    embeddings (notebook aggregate_{max,mean,topk}). One MXU einsum for the
    whole probe set.
    """
    p = probes / (jnp.linalg.norm(probes, axis=1, keepdims=True) + _EPS)
    sims = jnp.einsum(
        "pd,imd->pim", p, gallery, preferred_element_type=jnp.float32
    )  # [P, I, M]
    valid = mask[None, :, :]
    if aggregation == "mean":
        total = jnp.sum(jnp.where(valid, sims, 0.0), axis=2)
        count = jnp.maximum(jnp.sum(valid, axis=2), 1)
        return total / count
    if aggregation == "topk":
        masked = jnp.where(valid, sims, _NEG)
        kk = min(k, sims.shape[2])
        top, _ = jax.lax.top_k(masked, kk)
        cnt = jnp.minimum(jnp.sum(valid, axis=2), kk)
        top = jnp.where(top > _NEG / 2, top, 0.0)
        return jnp.sum(top, axis=2) / jnp.maximum(cnt, 1)
    # 'max' and unknown methods fall back to max, like the reference
    return jnp.max(jnp.where(valid, sims, _NEG), axis=2)


def compute_rank_metrics_batch(
    scores: np.ndarray, true_idx: np.ndarray, ranks: List[int] = [1, 5, 10]
) -> Dict[str, np.ndarray]:
    """Vectorized rank metrics. scores [P, I]; true_idx [P] (−1 = true
    identity not enrolled). Returns {'rank1': [P] bool, ..., 'reciprocal_rank':
    [P] float} matching notebook compute_rank_metrics (cell 6) semantics:
    rank counts strictly-greater scores (ties resolved optimistically)."""
    p, i = scores.shape
    enrolled = true_idx >= 0
    safe_idx = np.clip(true_idx, 0, i - 1)
    true_scores = scores[np.arange(p), safe_idx]
    # rank of the true identity = 1 + #identities scoring strictly higher
    higher = np.sum(scores > true_scores[:, None], axis=1)
    rank = higher + 1
    out: Dict[str, np.ndarray] = {}
    for r in ranks:
        out[f"rank{r}"] = enrolled & (rank <= r)
    out["reciprocal_rank"] = np.where(enrolled, 1.0 / rank, 0.0)
    return out


def compute_dprime(genuine_scores, impostor_scores) -> float:
    """(mean_g - mean_i) / pooled std (notebook cell 6)."""
    if len(genuine_scores) == 0 or len(impostor_scores) == 0:
        return 0.0
    g, imp = np.asarray(genuine_scores), np.asarray(impostor_scores)
    pooled = np.sqrt((g.std() ** 2 + imp.std() ** 2) / 2)
    if pooled == 0:
        return 0.0
    return float((g.mean() - imp.mean()) / pooled)


def bootstrap_confidence_interval(
    data, n_bootstrap: int = 1000, confidence: float = 0.95, seed: int = 0
) -> Tuple[float, float]:
    """Percentile bootstrap CI of the mean — vectorized (the notebook loops
    n_bootstrap times; one rng.choice matrix here)."""
    data = np.asarray(data, dtype=np.float64)
    if data.size == 0:
        return (0.0, 0.0)
    rng = np.random.default_rng(seed)
    # Chunk the resample rows: impostor-score lists reach P*(I-1) elements,
    # and a single (n_bootstrap, size) float64 matrix for them is multi-GB.
    # 50 rows at a time keeps the vectorization with bounded memory.
    means = np.empty(n_bootstrap, dtype=np.float64)
    row_chunk = max(1, min(n_bootstrap, int(16e6) // data.size))
    for start in range(0, n_bootstrap, row_chunk):
        stop = min(start + row_chunk, n_bootstrap)
        samples = rng.choice(data, size=(stop - start, data.size), replace=True)
        means[start:stop] = samples.mean(axis=1)
    alpha = 1 - confidence
    return (
        float(np.percentile(means, alpha / 2 * 100)),
        float(np.percentile(means, (1 - alpha / 2) * 100)),
    )


def roc_auc_and_ap(
    y_true: np.ndarray, y_scores: np.ndarray
) -> Tuple[Optional[float], Optional[float], np.ndarray, np.ndarray]:
    """ROC-AUC + average precision (sklearn, as the reference uses).

    With a single class present both metrics are UNDEFINED and reported as
    None (-> JSON null, 'n/a' in summaries) — never 0.0, which would read
    as the worst possible score next to a perfect rank-1."""
    from sklearn.metrics import auc, average_precision_score, roc_curve

    if len(set(y_true.tolist())) < 2:
        return None, None, np.array([0.0, 1.0]), np.array([0.0, 1.0])
    fpr, tpr, _ = roc_curve(y_true, y_scores)
    return float(auc(fpr, tpr)), float(average_precision_score(y_true, y_scores)), fpr, tpr


def fmt_metric(value, spec: str = ".3f") -> str:
    """Format a possibly-undefined (None/NaN) metric for human-facing text."""
    if value is None:
        return "n/a"
    try:
        if np.isnan(value):
            return "n/a"
    except TypeError:
        pass
    return format(value, spec)
