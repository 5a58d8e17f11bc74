"""Detector OOD artifact gates (VERDICT r4 #2).

reports/detector_ood/report.json is produced by
examples/detector_ood_eval.py: 'base' is the HONEST held-out measurement
of the shipped in-distribution weights on the facegen renderer + unseen
corruption battery (measured r5: AP ~0.20 — the generalization gap the
reference never had to pay because it inherits SCRFD); 'dr_retrained_*'
rows are the domain-randomized cascade (pretrained/mtcnn_dr.npz) that
closes it. These gates pin the closure and the no-regression story."""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPORT = os.path.join(REPO, "reports", "detector_ood", "report.json")


@pytest.fixture(scope="module")
def report():
    if not os.path.exists(REPORT):
        pytest.skip("detector OOD report not generated")
    with open(REPORT) as f:
        return json.load(f)


def test_base_row_is_the_held_out_measurement(report):
    base = report["base"]
    assert base["held_out"] is True
    # every OOD category was actually measured
    assert set(base["summary"]) >= {
        "facegen", "facegen_crowded", "facegen_accessories", "facegen+jpeg",
        "facegen+defocus", "facegen+lowlight", "facegen+banding",
    }


def test_domain_randomized_closes_the_gap(report):
    if "dr_retrained_ood" not in report:
        pytest.skip("retrained rows absent (run --retrain)")
    dr = report["dr_retrained_ood"]["summary"]
    base = report["base"]["summary"]
    # headline OOD axes lifted far above the in-distribution-only weights
    assert dr["facegen"]["ap"] >= 0.85
    assert dr["facegen_crowded"]["ap"] >= 0.8
    assert dr["facegen_accessories"]["ap"] >= 0.6
    assert dr["facegen+jpeg"]["ap"] >= 0.85
    assert dr["facegen+defocus"]["ap"] >= 0.7
    assert dr["facegen+banding"]["ap"] >= 0.6
    # low-light is the hardest axis; require a real lift, not perfection
    assert dr["facegen+lowlight"]["ap"] >= 0.3
    for cat in dr:
        if base[cat]["ap"] is not None and dr[cat]["ap"] is not None:
            assert dr[cat]["ap"] >= base[cat]["ap"] - 0.05, cat


def test_no_in_distribution_collapse(report):
    """The DR weights must keep the in-distribution stress suite healthy
    (the retrain trades a little stress fit for generalization — bound
    the trade)."""
    if "dr_retrained_stress" not in report:
        pytest.skip("retrained stress row absent")
    s = report["dr_retrained_stress"]["summary"]
    for cat in ("baseline", "tiny", "huge", "rotated", "low_contrast",
                "noisy", "domain_shift"):
        assert s[cat]["ap"] >= 0.9, (cat, s[cat])
    assert s["crowded"]["ap"] >= 0.85
    assert s["motion_blur"]["ap"] >= 0.85  # measured 0.889 on mtcnn_dr
    assert s["occlusion"]["ap"] >= 0.7
    assert s["hard_negatives"]["fp_per_image"] <= 1.0
