"""Golden tests for quality math vs the reference formulas (cv2/numpy)."""

import cv2
import numpy as np

from facerecognitionpipeline_tpu.ops.quality import (
    QualityConfig,
    laplacian_blur_score,
    pose_angles,
    quality_check,
)


def _cv2_blur_score(face_rgb: np.ndarray) -> float:
    gray = cv2.cvtColor(face_rgb, cv2.COLOR_RGB2GRAY)
    return float(cv2.Laplacian(gray, cv2.CV_64F).var())


def test_blur_score_matches_cv2(rng):
    faces = rng.integers(0, 256, size=(4, 112, 112, 3), dtype=np.uint8)
    ours = np.asarray(laplacian_blur_score(faces))
    golden = np.array([_cv2_blur_score(f) for f in faces])
    np.testing.assert_allclose(ours, golden, rtol=2e-3)


def test_blur_score_grayscale_input(rng):
    gray = rng.integers(0, 256, size=(2, 64, 64), dtype=np.uint8)
    ours = np.asarray(laplacian_blur_score(gray))
    golden = np.array(
        [float(cv2.Laplacian(g, cv2.CV_64F).var()) for g in gray]
    )
    np.testing.assert_allclose(ours, golden, rtol=1e-4)


def _reference_pose(landmarks: np.ndarray) -> dict:
    # Formulas from face_recognition.py:101-121, scalar per face.
    left_eye, right_eye, nose = landmarks[0], landmarks[1], landmarks[2]
    left_mouth, right_mouth = landmarks[3], landmarks[4]
    eye_center = (left_eye + right_eye) / 2
    eye_delta = right_eye - left_eye
    roll = np.degrees(np.arctan2(eye_delta[1], eye_delta[0]))
    nose_offset_x = nose[0] - eye_center[0]
    eye_distance = np.linalg.norm(eye_delta)
    yaw = np.degrees(np.arcsin(np.clip(nose_offset_x / eye_distance, -1, 1))) * 2
    mouth_center = (left_mouth + right_mouth) / 2
    face_height = mouth_center[1] - eye_center[1]
    pitch = ((nose[1] - eye_center[1]) / face_height - 0.5) * 60
    return {"yaw": yaw, "pitch": pitch, "roll": roll}


def test_pose_angles_match_reference(rng):
    base = np.array(
        [[38.3, 51.7], [73.5, 51.5], [56.0, 71.7], [41.5, 92.4], [70.7, 92.2]],
        dtype=np.float32,
    )
    lms = base[None] + rng.normal(0, 5, size=(16, 5, 2)).astype(np.float32)
    got = pose_angles(lms)
    for i in range(16):
        want = _reference_pose(lms[i])
        for k in ("yaw", "pitch", "roll"):
            np.testing.assert_allclose(
                float(got[k][i]), want[k], rtol=1e-4, atol=1e-3
            )


def test_quality_gate_thresholds():
    # A frontal face with good geometry.
    good_lm = np.array(
        [[38.0, 52.0], [74.0, 52.0], [56.0, 71.0], [42.0, 92.0], [70.0, 92.0]],
        dtype=np.float32,
    )
    # A strongly-yawed face: nose far off the eye midline.
    yawed_lm = good_lm.copy()
    yawed_lm[2, 0] += 30.0

    lms = np.stack([good_lm, good_lm, good_lm, yawed_lm])
    det = np.array([0.9, 0.3, 0.9, 0.9], dtype=np.float32)  # [1] fails det
    boxes = np.array(
        [
            [0, 0, 100, 100],
            [0, 0, 100, 100],
            [0, 0, 30, 100],  # [2] fails min size (min(w,h)=30)
            [0, 0, 100, 100],
        ],
        dtype=np.float32,
    )
    cfg = QualityConfig(min_det_score=0.6, min_face_size=60, check_blur=False)
    ok, metrics = quality_check(det, boxes, lms, cfg)
    assert np.asarray(ok).tolist() == [True, False, False, False]
    assert float(metrics["face_size"][2]) == 30.0
    assert abs(float(metrics["yaw"][3])) > 45.0


def test_quality_gate_valid_mask():
    lm = np.array(
        [[38.0, 52.0], [74.0, 52.0], [56.0, 71.0], [42.0, 92.0], [70.0, 92.0]],
        dtype=np.float32,
    )
    lms = np.stack([lm, lm])
    det = np.array([0.9, 0.9], dtype=np.float32)
    boxes = np.array([[0, 0, 100, 100]] * 2, dtype=np.float32)
    cfg = QualityConfig(check_blur=False)
    ok, _ = quality_check(
        det, boxes, lms, cfg, valid_mask=np.array([True, False])
    )
    assert np.asarray(ok).tolist() == [True, False]
