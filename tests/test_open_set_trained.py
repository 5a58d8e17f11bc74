"""Open-set accuracy regression gates (VERDICT r4 #1).

Two layers of gating:

* the COMMITTED artifact (reports/openset_ir_18/report.json, produced by
  examples/open_set_eval.py on the trained ir_18): its headline numbers
  must stay above floors — if a regenerated report degrades, this fails
  loudly at commit time;
* a live mini-protocol (slow marker) that re-runs rendering + embedding +
  scoring with the cached trained weights, so the whole chain (facegen ->
  embedder -> evalharness) is executed, not just trusted.

Thresholds sit ~5-10pp under the measured values (clean rank-1 1.000,
blur EER 0.140, DIR@FAR1% clean 1.000 / blur 0.641; int8 within ~1pp of
fp32 everywhere) — tight enough to catch real regressions, loose enough
for render-seed jitter.
"""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARCHS = ("ir_18", "ir_50")
WEIGHTS = os.path.join(REPO, "pretrained", "ir_18_synthetic.npz")


@pytest.fixture(scope="module", params=ARCHS)
def report(request):
    path = os.path.join(
        REPO, "reports", f"openset_{request.param}", "report.json"
    )
    if not os.path.exists(path):
        pytest.skip(f"open-set report for {request.param} not generated")
    with open(path) as f:
        return json.load(f)


def test_protocol_scale(report):
    p = report["protocol"]
    # the VERDICT bar: hundreds of identities, held out from training
    assert p["n_gallery_identities"] >= 200
    assert p["n_unknown_identities"] >= 40
    assert "disjoint" in p["held_out"]


def test_clean_headline_floors(report):
    clean = report["fp32"]["clean"]
    assert clean["rank1"] >= 0.97
    assert clean["eer"] <= 0.03
    assert clean["tar_at_far_0.01"] >= 0.95
    assert clean["dir_at_far_0.01"] >= 0.95
    assert clean["dprime"] >= 4.0


def test_curves_are_sloped_not_saturated(report):
    """Hard conditions must sit strictly between floor and ceiling so the
    metric has regression sensitivity (the r4 critique of the base
    protocol)."""
    fp32 = report["fp32"]
    hard_eers = [fp32[c]["eer"] for c in ("blur", "lowlight", "occlusion")]
    assert all(0.01 < e < 0.5 for e in hard_eers), hard_eers
    hard_dirs = [fp32[c]["dir_at_far_0.01"]
                 for c in ("blur", "lowlight", "occlusion")]
    assert all(0.3 < d < 0.999 for d in hard_dirs), hard_dirs
    # and hard is strictly harder than clean
    assert min(hard_eers) > fp32["clean"]["eer"]


def test_int8_tier_tracks_fp32(report):
    if "int8" not in report:
        pytest.skip("int8 tier not in report")
    for cond, fp in report["fp32"].items():
        q = report["int8"][cond]
        assert abs(q["rank1"] - fp["rank1"]) < 0.03, cond
        assert abs(q["eer"] - fp["eer"]) < 0.03, cond
    drift = report["int8_drift_cosine"]
    assert drift["mean"] > 0.995 and drift["min"] > 0.98


@pytest.mark.slow
def test_live_mini_open_set_protocol():
    """End-to-end re-execution at reduced scale: 30 held-out gallery ids +
    10 unknown, clean + occlusion, fp32. Requires the cached trained
    weights (gitignored; retrain via examples/train_ir18_open_set.py)."""
    if not os.path.exists(WEIGHTS):
        pytest.skip("trained ir_18 weights not cached")
    from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder
    from facerecognitionpipeline_tpu.train.facegen import (
        render_crop,
        sample_identity,
    )

    rng = np.random.default_rng(5)
    emb = FaceEmbedder(architecture="ir_18", model_path=WEIGHTS)

    def embed(ids, k):
        crops = [render_crop(sample_identity(10_000 + i), rng)
                 for i in ids for _ in range(k)]
        e = np.asarray(emb.extract_embeddings_batch(crops), np.float32)
        return e.reshape(len(ids), k, -1)

    gal = embed(range(30), 3).mean(axis=1)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True) + 1e-9
    known = embed(range(30), 2)
    unknown = embed(range(400, 410), 2)

    ks = known.reshape(-1, 512) @ gal.T
    us = unknown.reshape(-1, 512) @ gal.T
    labels = np.repeat(np.arange(30), 2)
    rank1 = float((ks.argmax(axis=1) == labels).mean())
    assert rank1 >= 0.95, rank1
    # open-set margin: known best scores clear unknown best scores
    tau = float(np.quantile(us.max(axis=1), 0.95))
    dir_rate = float(((ks.max(axis=1) >= tau)
                      & (ks.argmax(axis=1) == labels)).mean())
    assert dir_rate >= 0.8, dir_rate
