"""Hard-variant evaluation: metrics must sit on a slope, not at ceiling.

Uses the reference's real checked-in embeddings (gallery backups), same as
test_reference_parity.py; skipped when the reference corpus is not mounted.
"""

import glob
import json
import os

import numpy as np
import pytest

from facerecognitionpipeline_tpu.evalharness.hardening import (
    cross_model_impostors,
    headline_hard_block,
    noise_knee,
    noise_sweep,
    perturb_corpus,
    subsampled_gallery,
)

BACKUP_DIR = "/root/reference/gallery/backups"
THRESHOLDS = [round(t, 2) for t in np.arange(0.20, 0.901, 0.05)]

pytestmark = pytest.mark.skipif(
    not glob.glob(os.path.join(BACKUP_DIR, "*.json")),
    reason="reference gallery backups not mounted",
)


def _load_model(prefix: str):
    paths = sorted(glob.glob(os.path.join(BACKUP_DIR, f"{prefix}_backup_*.json")))
    with open(paths[-1]) as f:
        students = json.load(f)["students"]
    ids = sorted(students)
    gallery, probes, negatives = {}, {}, {}
    for sid in ids[:-3]:
        rec = students[sid]
        embs = np.asarray(rec["embeddings"], np.float32)
        gallery[rec["name"]] = {"embeddings": embs[:5]}
        probes[rec["name"]] = {"embeddings": embs[5:]}
    for sid in ids[-3:]:
        rec = students[sid]
        negatives[rec["name"]] = {
            "embeddings": np.asarray(rec["embeddings"], np.float32)
        }
    return gallery, probes, negatives


@pytest.fixture(scope="module")
def adaface_corpus():
    return _load_model("adaface_ir_101")


def test_noise_sweep_puts_metrics_on_a_slope(adaface_corpus):
    gallery, probes, negatives = adaface_corpus
    rows = noise_sweep(
        gallery, probes, negatives, THRESHOLDS, sigmas=(0.0, 4.0, 8.0)
    )
    # clean protocol is saturated by construction...
    assert rows[0]["rank1_accuracy"] == 1.0
    assert rows[0]["eer"] <= 0.01
    # ...mid-noise: verification off the ceiling but still strong —
    # this is the regression-sensitive band (r2 VERDICT "de-saturate")
    assert rows[1]["roc_auc"] is not None and 0.9 < rows[1]["roc_auc"] < 1.0
    assert 0.01 < rows[1]["eer"] < 0.2
    assert 2.0 < rows[1]["dprime"] < 6.0
    # ...heavy noise: identification itself degrades but isn't destroyed
    assert 0.3 < rows[2]["rank1_accuracy"] < 0.95
    assert rows[2]["roc_auc"] is not None and 0.5 < rows[2]["roc_auc"] < 0.9
    # monotone degradation along the sweep
    d = [r["dprime"] for r in rows]
    assert d[0] > d[1] > d[2]
    g = [r["genuine_mean"] for r in rows]
    assert g[0] > g[1] > g[2]


def test_perturb_is_seeded_and_unit_norm(adaface_corpus):
    _, probes, _ = adaface_corpus
    a = perturb_corpus(probes, 0.5, seed=7)
    b = perturb_corpus(probes, 0.5, seed=7)
    name = next(iter(a))
    np.testing.assert_array_equal(a[name]["embeddings"], b[name]["embeddings"])
    np.testing.assert_allclose(
        np.linalg.norm(a[name]["embeddings"], axis=1), 1.0, atol=1e-5
    )


def test_subsampled_gallery_open_set(adaface_corpus):
    gallery, probes, negatives = adaface_corpus
    out = subsampled_gallery(
        gallery, probes, negatives, THRESHOLDS, n_enrolled=10, seed=0
    )
    assert out["n_enrolled"] == 10
    # half the identities are now open-set impostors; the stat counts
    # IDENTITIES only — not the negative-corpus category keys ('real',
    # 'lfw'), which an earlier version folded in
    assert out["n_open_set_identities"] == len(gallery) - 10
    # enrolled probes still identify; impostors must not score like genuines
    assert out["rank1_accuracy"] > 0.9
    assert out["impostor_mean"] < out["genuine_mean"]


def test_cross_model_impostors_rejected(adaface_corpus):
    gallery, probes, negatives = adaface_corpus
    _, arc_probes, _ = _load_model("arcface_ir_101")
    out = cross_model_impostors(gallery, probes, arc_probes, THRESHOLDS, negatives)
    # foreign-space embeddings of the SAME people must stay separable
    assert out["impostor_mean"] < out["genuine_mean"]
    assert out["eer"] < 0.2


def test_hardening_accepts_category_wrapped_corpus(adaface_corpus):
    """pipeline/corpus.py saves unsegmented corpora as {'all': {name: ...}}
    and evaluate_* unwrap that layout — the hardening variants must accept
    it too (they crashed / silently mislabeled the whole positive set as
    impostors before)."""
    gallery, probes, negatives = adaface_corpus
    wrapped_g = {"all": gallery}
    wrapped_p = {"all": probes}

    noisy = perturb_corpus(wrapped_p, sigma=1.0, seed=0)
    assert set(noisy) == set(probes)  # unwrapped, person-keyed

    sub = subsampled_gallery(
        wrapped_g, wrapped_p, negatives, THRESHOLDS,
        n_enrolled=max(1, len(gallery) - 2), seed=0,
    )
    plain = subsampled_gallery(
        gallery, probes, negatives, THRESHOLDS,
        n_enrolled=max(1, len(gallery) - 2), seed=0,
    )
    assert sub["n_enrolled"] == plain["n_enrolled"] > 0
    assert sub["n_open_set_identities"] == plain["n_open_set_identities"]
    assert sub["rank1_accuracy"] == plain["rank1_accuracy"]

    x = cross_model_impostors(wrapped_g, wrapped_p, wrapped_p, THRESHOLDS)
    assert 0.0 <= x["rank1_accuracy"] <= 1.0

    # 'all'-wrapped NEGATIVES must behave like plain negatives: left
    # wrapped, verification's .get('all') selected only the wrapped inner
    # dict and silently dropped every merged open-set/xmodel impostor
    wrapped_n = {"all": negatives}
    sub_w = subsampled_gallery(
        gallery, probes, wrapped_n, THRESHOLDS,
        n_enrolled=max(1, len(gallery) - 2), seed=0,
    )
    assert sub_w["impostor_mean"] == plain["impostor_mean"]
    x_plain = cross_model_impostors(gallery, probes, probes, THRESHOLDS, negatives)
    x_w = cross_model_impostors(gallery, probes, probes, THRESHOLDS, wrapped_n)
    assert x_w["impostor_mean"] == x_plain["impostor_mean"]


# --------------------------------------------- headline front page (r3 #3)


def test_noise_knee_interpolates():
    rows = [
        {"sigma": 0.0, "rank1_accuracy": 1.0},
        {"sigma": 4.0, "rank1_accuracy": 1.0},
        {"sigma": 6.0, "rank1_accuracy": 0.90},
    ]
    # crossing 0.95 halfway down the 4->6 segment
    assert noise_knee(rows, criterion=0.95) == pytest.approx(5.0)
    # never crosses -> None (knee beyond the swept range)
    assert noise_knee(rows[:2], criterion=0.95) is None
    # first row already below -> that sigma
    assert noise_knee(rows[2:], criterion=0.95) == 6.0


HEADLINE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "reports", "real_embedding_eval", "headline.json",
)


@pytest.mark.skipif(not os.path.exists(HEADLINE), reason="report not built")
def test_checked_in_headline_leads_with_sloped_metrics():
    """The flagship eval artifact must have regression sensitivity on its
    face: the hard block comes first and none of its scalars sit at
    floor/ceiling (VERDICT r3 #3). The saturated base protocol stays as an
    explicitly-labeled compatibility row."""
    with open(HEADLINE) as f:
        headline = json.load(f)
    assert headline, "empty headline"
    for model, blk in headline.items():
        keys = list(blk)
        assert keys[0] == "hard", f"{model}: hard block must lead"
        assert "base_protocol_saturated" in blk, model
        hb = blk["hard"]
        # the knee is a finite interpolated scalar strictly inside the sweep
        assert hb["noise_knee_sigma"] is not None, model
        assert 0.0 < hb["noise_knee_sigma"] < hb["sigma_max"], model
        # at the hardest sigma identification is degraded but not destroyed
        assert 0.0 < hb["rank1_at_sigma_max"] < 1.0, model
        assert 0.0 < hb["eer_at_sigma_max"] < 0.5, model
        # margins are strictly between floor (0) and ceiling (saturated ~1.8)
        assert 0.0 < hb["open_set_margin_n10"] < 1.0, model
        if hb["cross_model_margin"] is not None:
            assert 0.0 < hb["cross_model_margin"] < 1.2, model


def test_headline_hard_block_shapes(adaface_corpus):
    gallery, probes, negatives = adaface_corpus
    rows = noise_sweep(
        gallery, probes, negatives, THRESHOLDS, sigmas=(0.0, 4.0, 8.0)
    )
    sub = subsampled_gallery(
        gallery, probes, negatives, THRESHOLDS, n_enrolled=10, seed=0
    )
    blk = headline_hard_block(
        {"noise_sweep": rows, "subsampled_gallery_10": sub,
         "cross_model_impostors": {"skipped": "n/a"}}
    )
    assert blk["sigma_max"] == 8.0
    assert blk["dprime_at_sigma4"] == pytest.approx(rows[1]["dprime"], abs=1e-3)
    assert blk["open_set_margin_n10"] == pytest.approx(
        sub["genuine_mean"] - sub["impostor_mean"], abs=1e-3
    )
    assert blk["cross_model_margin"] is None  # skipped block -> None
