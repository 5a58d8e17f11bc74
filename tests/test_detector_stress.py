"""Detection stress harness: metric correctness + regression thresholds for
the shipped cascade weights (VERDICT r1 #6 — the reference gets detection
robustness for free from SCRFD, face_recognition.py:20-48, but ships no
detection evaluation; we measure ours)."""

import os

import numpy as np
import pytest

from facerecognitionpipeline_tpu.evalharness.detection import (
    STRESS_CATEGORIES,
    evaluate_detector_category,
    iou_matrix,
    match_detections,
    pr_curve,
    render_stress_scene,
    render_stress_training_scene,
)

WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pretrained", "mtcnn_synthetic.npz",
)


# ----------------------------------------------------------------- metrics


def test_iou_matrix_and_matching():
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    pred = np.array([[1, 1, 11, 11], [100, 100, 110, 110], [19, 19, 29, 29]],
                    np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    m = iou_matrix(pred, gt)
    assert m.shape == (3, 2)
    assert m[1].max() == 0.0
    s, tp = match_detections(pred, scores, gt, iou_thresh=0.5)
    assert list(tp) == [True, False, True]

    # duplicate detections on one GT: only the highest-scored matches
    dup = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    _, tp = match_detections(dup, np.array([0.9, 0.8]), gt[:1])
    assert list(tp) == [True, False]


def test_pr_curve_ap():
    scores = np.array([0.9, 0.8, 0.7, 0.6])
    is_tp = np.array([True, True, False, True])
    out = pr_curve(scores, is_tp, n_gt=3)
    assert out["recall"][-1] == pytest.approx(1.0)
    # AP: r=1/3 at p=1, r=2/3 at p=1, r=3/3 at p=max(3/4)=0.75
    assert out["ap"] == pytest.approx((1 / 3) + (1 / 3) + (1 / 3) * 0.75)
    # perfect detector
    out = pr_curve(np.array([0.9, 0.8]), np.array([True, True]), 2)
    assert out["ap"] == pytest.approx(1.0)


def test_stress_scenes_render():
    rng = np.random.default_rng(0)
    for cat in STRESS_CATEGORIES:
        img, boxes = render_stress_scene(rng, cat, size=320)
        assert img.shape == (320, 320, 3) and img.dtype == np.uint8
        if cat == "hard_negatives":
            assert len(boxes) == 0
        elif cat == "crowded":
            assert len(boxes) >= 10
        else:
            assert len(boxes) >= 1
    img, boxes, lms, neg_boxes = render_stress_training_scene(rng)
    assert len(boxes) == len(lms)
    assert len(neg_boxes) >= 1  # distractors exposed for hard-negative mining


@pytest.fixture(scope="module")
def base_detector():
    from facerecognitionpipeline_tpu.models.detector import MTCNNDetector

    return MTCNNDetector(
        det_size=(320, 320), max_faces=32, min_face_size=18,
        weights_path=WEIGHTS, stage_thresholds=(0.6, 0.6, 0.5),
    )


# -------------------------------------------------------------- regression


@pytest.mark.skipif(not os.path.exists(WEIGHTS), reason="weights not present")
@pytest.mark.parametrize(
    "category,min_recall,min_ap",
    [
        ("baseline", 0.95, 0.95),
        ("crowded", 0.90, 0.90),
        ("tiny", 0.90, 0.90),
        ("rotated", 0.90, 0.90),
        ("low_contrast", 0.85, 0.85),
        ("occlusion", 0.55, 0.55),
    ],
)
def test_shipped_weights_stress_thresholds(base_detector, category, min_recall,
                                           min_ap):
    r = evaluate_detector_category(
        base_detector, category, n_scenes=5, seed=1, operating_threshold=0.5,
    )
    assert r["operating_point"]["recall"] >= min_recall, r["operating_point"]
    assert r["ap"] >= min_ap, r["ap"]


STRESS_WEIGHTS = os.path.join(os.path.dirname(WEIGHTS), "mtcnn_stress.npz")


@pytest.mark.skipif(
    not os.path.exists(STRESS_WEIGHTS), reason="stress weights not present"
)
def test_stress_retrained_weights_beat_base_on_stress_axes():
    """pretrained/mtcnn_stress.npz was retrained with occluders + explicit
    hard-negative patch mining (train.detector_train.sample_patches neg_boxes
    path), the non-face distractor / domain-shift / motion-blur axes, and
    (round 3, second pass) 30% PURE-negative training scenes; it must hold
    the measured improvements: occlusion AP 0.74 -> 0.97, faceless
    hard-negative scenes 2.8 -> 0.17 fp/img, nonface-distractor precision
    0.34 -> 1.0 (reports/detector_stress)."""
    from facerecognitionpipeline_tpu.models.detector import MTCNNDetector

    det = MTCNNDetector(
        det_size=(320, 320), max_faces=32, min_face_size=18,
        weights_path=STRESS_WEIGHTS, stage_thresholds=(0.6, 0.6, 0.5),
    )
    occ = evaluate_detector_category(
        det, "occlusion", n_scenes=5, seed=1, operating_threshold=0.5,
    )
    assert occ["operating_point"]["recall"] >= 0.85, occ["operating_point"]
    assert occ["ap"] >= 0.85, occ["ap"]
    hn = evaluate_detector_category(
        det, "hard_negatives", n_scenes=5, seed=1, operating_threshold=0.5,
    )
    # report (fixed seed 0) shows 0.17 fp/img; leave ~1 fp/img of
    # scene-seed headroom so an unrelated seed change can't flake this
    assert hn["operating_point"]["false_positives_per_image"] <= 1.2
    nf = evaluate_detector_category(
        det, "nonface_distractors", n_scenes=5, seed=1,
        operating_threshold=0.5,
    )
    assert nf["operating_point"]["recall"] >= 0.85, nf["operating_point"]
    assert nf["operating_point"]["precision"] >= 0.75, nf["operating_point"]
    mb = evaluate_detector_category(
        det, "motion_blur", n_scenes=5, seed=1, operating_threshold=0.5,
    )
    assert mb["operating_point"]["recall"] >= 0.7, mb["operating_point"]


@pytest.mark.skipif(
    not os.path.exists(STRESS_WEIGHTS), reason="stress weights not present"
)
@pytest.mark.parametrize(
    "category,min_recall,min_ap,max_fp",
    [
        # round-3 axes (VERDICT r2 #8): hands/patterned-clothing/clutter
        # distractors, lighting+texture domain shift, directional motion
        # blur. reports/detector_stress (12 scenes, seed 0): nonface AP 1.0
        # @ 1.5 fp/img, domain_shift AP 1.0, motion_blur AP 0.96.
        ("nonface_distractors", 0.85, 0.85, 3.0),
        ("domain_shift", 0.85, 0.85, 1.0),
        ("motion_blur", 0.80, 0.80, 1.0),
    ],
)
def test_stress_weights_round3_axes(category, min_recall, min_ap, max_fp):
    from facerecognitionpipeline_tpu.models.detector import MTCNNDetector

    det = MTCNNDetector(
        det_size=(320, 320), max_faces=32, min_face_size=18,
        weights_path=STRESS_WEIGHTS, stage_thresholds=(0.6, 0.6, 0.5),
    )
    r = evaluate_detector_category(
        det, category, n_scenes=5, seed=1, operating_threshold=0.5,
    )
    assert r["operating_point"]["recall"] >= min_recall, r["operating_point"]
    assert r["ap"] >= min_ap, r["ap"]
    assert (
        r["operating_point"]["false_positives_per_image"] <= max_fp
    ), r["operating_point"]


@pytest.mark.skipif(not os.path.exists(WEIGHTS), reason="weights not present")
def test_shipped_weights_hard_negative_rate(base_detector):
    r = evaluate_detector_category(
        base_detector, "hard_negatives", n_scenes=5, seed=1,
        operating_threshold=0.5,
    )
    assert r["operating_point"]["false_positives_per_image"] <= 4.0


BALANCED_WEIGHTS = os.path.join(
    os.path.dirname(WEIGHTS), "mtcnn_stress_balanced.npz"
)


@pytest.mark.skipif(
    not os.path.exists(BALANCED_WEIGHTS),
    reason="balanced stress weights not present",
)
def test_balanced_weights_rejection_profile():
    """pretrained/mtcnn_stress_balanced.npz (pure_negative_p=0.45 +
    class_balance quota) trades a little motion-blur recall for roughly
    half the faceless-scene false positives — pin the profile it ships
    for (reports/detector_stress/pure_negative_tradeoff.md)."""
    from facerecognitionpipeline_tpu.models.detector import MTCNNDetector

    det = MTCNNDetector(
        det_size=(320, 320), max_faces=32, min_face_size=18,
        weights_path=BALANCED_WEIGHTS, stage_thresholds=(0.6, 0.6, 0.5),
    )
    hn = evaluate_detector_category(
        det, "hard_negatives", n_scenes=5, seed=1, operating_threshold=0.5,
    )
    # shipped recall-max weights allow <= 4.0 here; the balanced variant
    # exists to do meaningfully better on faceless scenes
    assert hn["operating_point"]["false_positives_per_image"] <= 1.0, (
        hn["operating_point"]
    )
    mb = evaluate_detector_category(
        det, "motion_blur", n_scenes=5, seed=1, operating_threshold=0.5,
    )
    assert mb["operating_point"]["recall"] >= 0.7, mb["operating_point"]
    oc = evaluate_detector_category(
        det, "occlusion", n_scenes=5, seed=1, operating_threshold=0.5,
    )
    assert oc["operating_point"]["recall"] >= 0.85, oc["operating_point"]


# ------------------------------------------------------- class-balanced quota


def test_sample_patches_class_balance_invariant_to_pure_negative_fraction():
    """The (pos, part) quota must hold the batch label mix constant as the
    pure-negative scene fraction rises — without it, measured positive
    supervision drops 23.7% -> 20.3% going pure_negative_p 0.30 -> 0.45
    (the mechanism behind the blur-recall trade-off in
    reports/detector_stress/pure_negative_tradeoff.md)."""
    from facerecognitionpipeline_tpu.train.detector_train import (
        render_scene,
        sample_patches,
    )

    def mixed(p):
        def fn(r):
            if r.random() < 0.5:
                return render_scene(r)
            return render_stress_training_scene(r, pure_negative_p=p)
        return fn

    mixes = {}
    for p in (0.3, 0.45):
        rng = np.random.default_rng(0)
        batch = sample_patches(rng, 12, 192, scene_fn=mixed(p),
                               class_balance=(0.25, 0.25))
        cls = batch["cls"]
        mixes[p] = (int((cls == 1).sum()), int((cls == -1).sum()),
                    int((cls == 0).sum()))
    # exact quota: 48 pos, 48 part, 96 neg at either fraction
    assert mixes[0.3] == mixes[0.45] == (48, 48, 96)


def test_sample_patches_unbalanced_default_unchanged():
    """Without class_balance the sampler keeps its historical behavior (the
    shipped weights' training recipe must stay reproducible)."""
    from facerecognitionpipeline_tpu.train.detector_train import sample_patches

    rng = np.random.default_rng(1)
    batch = sample_patches(rng, 12, 64)
    cls = batch["cls"]
    assert set(np.unique(cls)).issubset({-1, 0, 1})
    assert (cls == 1).sum() > 0 and (cls == 0).sum() > 0
    # regression masks only on non-negative labels
    assert not batch["reg_mask"][cls == 0].any()
    assert batch["reg_mask"][cls == 1].all()
