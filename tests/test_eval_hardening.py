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
