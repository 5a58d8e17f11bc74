"""End-to-end detection with the shipped self-trained cascade weights.

`pretrained/mtcnn_synthetic.npz` was produced by
`train/detector_train.train_detector` on the built-in synthetic face
renderer — so detection, landmark regression and the full
FaceProcessor pipeline can be validated with real (non-stub) detector
behavior and zero external assets.
"""

import os

import numpy as np
import pytest

from facerecognitionpipeline_tpu.models.detector import MTCNNDetector
from facerecognitionpipeline_tpu.pipeline.processor import FaceProcessor
from facerecognitionpipeline_tpu.train.detector_train import render_scene

WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pretrained", "mtcnn_synthetic.npz",
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(WEIGHTS), reason="trained detector weights not present"
)


def _iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


@pytest.fixture(scope="module")
def detector():
    return MTCNNDetector(
        det_size=(160, 160), max_faces=8, min_face_size=20,
        weights_path=WEIGHTS, stage_thresholds=(0.6, 0.6, 0.5),
    )


def test_detects_rendered_faces(detector):
    rng = np.random.default_rng(7)
    hits = total = 0
    for _ in range(6):
        img, boxes, lms = render_scene(rng, size=160)
        faces = detector.detect(img)
        total += len(boxes)
        for gt in boxes:
            if any(_iou(f["bbox"], gt) > 0.4 for f in faces):
                hits += 1
    assert total >= 6
    assert hits / total >= 0.8, f"recall {hits}/{total}"


def test_landmarks_near_ground_truth(detector):
    rng = np.random.default_rng(11)
    errs = []
    for _ in range(6):
        img, boxes, lms = render_scene(rng, size=160, max_faces=1)
        faces = detector.detect(img)
        if not faces:
            continue
        gt_box = boxes[0]
        best = max(faces, key=lambda f: _iou(f["bbox"], gt_box))
        if _iou(best["bbox"], gt_box) < 0.4:
            continue
        face_size = (gt_box[2] - gt_box[0] + gt_box[3] - gt_box[1]) / 2
        err = np.linalg.norm(best["landmarks"] - lms[0], axis=1).mean() / face_size
        errs.append(err)
    assert errs, "no matched detections"
    # mean normalized landmark error under 15% of face size
    assert float(np.mean(errs)) < 0.15, errs


def test_full_processor_pipeline_with_real_detection(detector):
    """detect -> align -> quality-gate on rendered scenes, no stubs anywhere."""
    proc = FaceProcessor(
        output_size=112,
        detector=detector,
        quality_filter_config={
            "min_det_score": 0.5, "min_face_size": 15,
            "max_yaw": 90, "max_pitch": 90, "max_roll": 90,
            "check_blur": False,
        },
    )
    rng = np.random.default_rng(3)
    img, boxes, _ = render_scene(rng, size=160, max_faces=1, min_face=40, max_face=60)
    results = proc.process_numpy(img, return_all=True)
    assert results, "pipeline found no faces"
    best = results[0]
    assert best["aligned_face"].shape == (112, 112, 3)
    assert _iou(best["bbox"], boxes[0]) > 0.3
    # the aligned crop should be dominated by the bright face, not background
    assert best["aligned_face"].mean() > 60
