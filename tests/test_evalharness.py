"""Evaluation harness: metric correctness + integration on REAL reference
embeddings (the checked-in gallery backups carry actual AdaFace/ArcFace
512-d embeddings for 23 students x 8 samples)."""

import json
import os

import numpy as np
import pytest

from facerecognitionpipeline_tpu.evalharness.identification import (
    evaluate_impostors_comprehensive,
    evaluate_probes_comprehensive,
    evaluate_segmented_comprehensive,
)
from facerecognitionpipeline_tpu.evalharness.metrics import (
    bootstrap_confidence_interval,
    compute_dprime,
    compute_rank_metrics_batch,
    identity_scores_batch,
    pack_gallery,
)
from facerecognitionpipeline_tpu.evalharness.verification import (
    evaluate_verification_comprehensive,
)

REFERENCE_BACKUP = (
    "/root/reference/gallery/backups/adaface_ir_101_backup_20251202_084813.json"
)


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


# ------------------------------------------------------------------ metrics


def test_identity_scores_aggregations(rng):
    gallery = {
        "a": {"embeddings": _norm(rng.normal(size=(3, 512)).astype(np.float32))},
        "b": {"embeddings": _norm(rng.normal(size=(5, 512)).astype(np.float32))},
    }
    names, packed, mask = pack_gallery(gallery)
    probe = _norm(rng.normal(size=(2, 512)).astype(np.float32))

    for agg, ref_fn in (
        ("max", lambda s: s.max()),
        ("mean", lambda s: s.mean()),
        ("topk", lambda s: np.sort(s)[-3:].mean()),
    ):
        scores = np.asarray(identity_scores_batch(probe, packed, mask, agg, 3))
        assert scores.shape == (2, 2)
        for p in range(2):
            for i, name in enumerate(names):
                sims = gallery[name]["embeddings"] @ probe[p]
                assert scores[p, i] == pytest.approx(ref_fn(sims), abs=1e-5), (
                    agg, name,
                )


def test_rank_metrics_batch():
    scores = np.array(
        [
            [0.9, 0.5, 0.1],   # true 0 -> rank 1
            [0.5, 0.9, 0.1],   # true 0 -> rank 2
            [0.1, 0.5, 0.9],   # true 0 -> rank 3
        ],
        np.float32,
    )
    r = compute_rank_metrics_batch(scores, np.array([0, 0, 0]), ranks=[1, 2])
    assert r["rank1"].tolist() == [True, False, False]
    assert r["rank2"].tolist() == [True, True, False]
    np.testing.assert_allclose(r["reciprocal_rank"], [1.0, 0.5, 1 / 3])
    # unenrolled identity
    r2 = compute_rank_metrics_batch(scores, np.array([-1, 0, 0]), ranks=[1])
    assert not r2["rank1"][0] and r2["reciprocal_rank"][0] == 0.0


def test_dprime_and_bootstrap(rng):
    g = rng.normal(0.8, 0.05, 500)
    i = rng.normal(0.2, 0.05, 500)
    d = compute_dprime(g, i)
    assert 10 < d < 14  # (0.6 / 0.05)
    lo, hi = bootstrap_confidence_interval(g, n_bootstrap=200)
    assert lo < g.mean() < hi
    assert compute_dprime([], []) == 0.0
    assert bootstrap_confidence_interval([]) == (0.0, 0.0)


def test_bootstrap_chunking_bounds_memory(rng):
    """Large score lists must not materialize an (n_bootstrap x size)
    matrix; the chunked path must still produce a CI around the mean."""
    data = rng.normal(0.5, 0.1, 40_000)
    lo, hi = bootstrap_confidence_interval(data, n_bootstrap=64)
    assert lo < data.mean() < hi and (hi - lo) < 0.01


def test_comparison_best_threshold_is_operating_point():
    """Rank metrics are threshold-independent, so the reference's bare
    idxmax(rank1) always reported the FIRST sweep row (threshold 0.20,
    FAR-maximal) as 'best'. Ties must break by F1."""
    import pandas as pd

    from facerecognitionpipeline_tpu.evalharness.comparison import (
        generate_comparison_summary,
    )

    df = pd.DataFrame({
        "threshold": [0.2, 0.5, 0.8],
        "rank1_accuracy": [1.0, 1.0, 1.0],
        "rank5_accuracy": [1.0, 1.0, 1.0],
        "rank10_accuracy": [1.0, 1.0, 1.0],
        "mrr": [1.0, 1.0, 1.0],
        "f1_score": [0.5, 0.9, 0.4],
        "tar": [1.0, 0.95, 0.5],
        "far": [0.4, 0.02, 0.0],
    })
    results = {"m": {"basic_probe": {"g": {"mean": {
        "threshold_results": df, "roc_auc": 0.99, "dprime": 3.0}}}}}
    out = generate_comparison_summary(results)
    assert float(out.iloc[0]["Best_Threshold"]) == 0.5
    assert float(out.iloc[0]["F1-Score"]) == 0.9


# ----------------------------------------------------- synthetic end-to-end


@pytest.fixture
def synthetic_corpus(rng):
    """5 identities with tight clusters + impostors far away."""
    centers = _norm(rng.normal(size=(5, 512)).astype(np.float32))
    gallery, probes = {}, {}
    for i in range(5):
        samples = _norm(centers[i] + 0.05 * rng.normal(size=(4, 512)).astype(np.float32))
        gallery[f"person_{i}"] = {"embeddings": samples}
        probes[f"person_{i}"] = {
            "embeddings": _norm(
                centers[i] + 0.05 * rng.normal(size=(3, 512)).astype(np.float32)
            )
        }
    negatives = {
        "lfw": {"embeddings": _norm(rng.normal(size=(20, 512)).astype(np.float32))}
    }
    return gallery, {"all": probes}, negatives


def test_identification_on_separable_data(synthetic_corpus):
    gallery, probes, _ = synthetic_corpus
    out = evaluate_probes_comprehensive(
        gallery, probes, thresholds=[0.2, 0.5, 0.8], aggregation="mean"
    )
    df = out["threshold_results"]
    assert df["rank1_accuracy"].iloc[0] == 1.0
    # every prediction is correct -> single-class y_true -> AUC is UNDEFINED
    # and must surface as None (never 0.0, which reads as the worst score)
    assert out["roc_auc"] is None
    assert out["dprime"] > 3
    assert len(out["all_predictions"]) == 15
    # low threshold: everything accepted and correct
    row = df[df["threshold"] == 0.2].iloc[0]
    assert row["tar"] == 1.0 and row["far"] == 0.0
    assert row["f1_score"] == 1.0


def test_impostor_rejection(synthetic_corpus):
    gallery, _, negatives = synthetic_corpus
    out = evaluate_impostors_comprehensive(
        gallery, negatives, thresholds=[0.2, 0.9]
    )
    df = out["threshold_results"]
    # random 512-d vectors score near 0 cosine: rejected at 0.2
    assert df[df["threshold"] == 0.2].iloc[0]["rejection_rate"] == 1.0
    assert out["mean_impostor_score"] < 0.2


def test_verification_metrics(synthetic_corpus):
    gallery, probes, negatives = synthetic_corpus
    out = evaluate_verification_comprehensive(
        gallery, probes, negatives,
        thresholds=[round(t, 2) for t in np.arange(0.05, 0.95, 0.05)],
    )
    assert out["roc_auc"] == pytest.approx(1.0, abs=1e-6)  # fully separable
    assert out["eer"] <= 0.05
    assert out["tar_at_far_0.01"] == 1.0
    assert out["n_genuine_pairs"] == 15
    assert out["n_impostor_pairs"] == 20
    assert out["genuine_mean"] > out["impostor_mean"]


def test_segmented(synthetic_corpus, rng):
    gallery, probes, _ = synthetic_corpus
    segmented = {
        "pose_easy": probes["all"],
        "pose_hard": {
            "person_0": {
                "embeddings": _norm(rng.normal(size=(2, 512)).astype(np.float32))
            }
        },
    }
    out = evaluate_segmented_comprehensive(gallery, segmented, thresholds=[0.2])
    assert set(out) == {"pose_easy", "pose_hard"}
    easy_r1 = out["pose_easy"]["threshold_results"]["rank1_accuracy"].iloc[0]
    hard_r1 = out["pose_hard"]["threshold_results"]["rank1_accuracy"].iloc[0]
    assert easy_r1 == 1.0
    assert hard_r1 <= easy_r1


# -------------------------------------------- real reference embedding data


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_BACKUP), reason="reference backup not mounted"
)
def test_real_adaface_embeddings_identification():
    """Split the reference's real 23x8 AdaFace ir_101 embeddings into
    gallery (5) / probe (3) per student: identification must be near-perfect
    and verification EER low — the same sanity the reference's own
    enrollment verification performs (enroll_students.py:350-402)."""
    with open(REFERENCE_BACKUP) as f:
        students = json.load(f)["students"]

    gallery, probes = {}, {}
    for rec in students.values():
        embs = np.asarray(rec["embeddings"], np.float32)
        name = rec["name"]
        gallery[name] = {"embeddings": embs[:5]}
        probes[name] = {"embeddings": embs[5:]}

    out = evaluate_probes_comprehensive(
        gallery, {"all": probes},
        thresholds=[round(t, 2) for t in np.arange(0.20, 0.901, 0.05)],
        aggregation="mean",
    )
    df = out["threshold_results"]
    assert df["rank1_accuracy"].iloc[0] >= 0.98
    assert out["dprime"] > 2.0

    ver = evaluate_verification_comprehensive(
        gallery, {"all": probes},
        {"rand": {"embeddings": np.random.default_rng(0).normal(
            size=(50, 512)).astype(np.float32)}},
        thresholds=[round(t, 2) for t in np.arange(0.05, 0.95, 0.02)],
    )
    assert ver["eer"] < 0.05
    assert ver["roc_auc"] > 0.99
