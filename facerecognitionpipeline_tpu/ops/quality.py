"""Batched face-quality math: blur, pose angles, and the quality gate.

Reimplements (vectorized, masked, jittable) the quality model of the
reference's `FaceQualityFilter` (`face_recognition.py:77-158`):

* blur      = variance of the 3x3 Laplacian of the grayscale crop
              (cv2.Laplacian(gray, CV_64F).var(), reflect-101 border)
* roll      = atan2 of the eye-to-eye delta
* yaw       = 2 * asin(nose x-offset / eye distance), degrees
* pitch     = (nose y-offset / eye-to-mouth height - 0.5) * 60
* gate      = det_score, min face size, |yaw|/|pitch|/|roll| limits, blur

Unlike the reference (one Python call per face), everything here takes a
padded batch and returns per-face metrics plus a validity mask, so the gate
lives inside the jitted pipeline graph.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from facerecognitionpipeline_tpu.ops.image import rgb_to_gray


@dataclasses.dataclass(frozen=True)
class QualityConfig:
    """Defaults mirror reference `FaceQualityFilter.__init__` (face_recognition.py:78-92)."""

    min_det_score: float = 0.6
    min_face_size: float = 60.0
    max_yaw: float = 45.0
    max_pitch: float = 30.0
    max_roll: float = 30.0
    check_blur: bool = True
    blur_threshold: float = 100.0


def laplacian_blur_score(faces: jax.Array) -> jax.Array:
    """Variance-of-Laplacian sharpness for a batch of face crops.

    faces: [B, H, W, 3] RGB or [B, H, W] grayscale, any real dtype.
    Returns [B] float32. Matches cv2.Laplacian(gray, CV_64F).var() with the
    default 3x3 kernel [[0,1,0],[1,-4,1],[0,1,0]] and reflect-101 border
    (reference `face_recognition.py:94-99`; cv2 RGB2GRAY truncates to uint8
    first, reproduced here via floor on the luma).
    """
    if faces.ndim == 4:
        # cv2.cvtColor on uint8 input rounds the luma to uint8 before Laplacian.
        gray = jnp.round(rgb_to_gray(faces))
    else:
        gray = faces.astype(jnp.float32)

    # Reflect-101 pad then 4-neighbor Laplacian; pure VPU work that XLA fuses.
    g = jnp.pad(gray, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    lap = (
        g[:, :-2, 1:-1] + g[:, 2:, 1:-1] + g[:, 1:-1, :-2] + g[:, 1:-1, 2:]
        - 4.0 * g[:, 1:-1, 1:-1]
    )
    return jnp.var(lap, axis=(1, 2))


def pose_angles(landmarks: jax.Array) -> dict[str, jax.Array]:
    """Head-pose estimate from 5-point landmarks.

    landmarks: [B, 5, 2] float (left eye, right eye, nose, left mouth,
    right mouth) in image coordinates. Returns {'yaw','pitch','roll'} each
    [B] float32 degrees. Formulas match reference
    `FaceQualityFilter.compute_pose_angles` (face_recognition.py:101-121).
    """
    lm = landmarks.astype(jnp.float32)
    left_eye, right_eye, nose = lm[:, 0], lm[:, 1], lm[:, 2]
    left_mouth, right_mouth = lm[:, 3], lm[:, 4]

    eye_center = (left_eye + right_eye) * 0.5
    eye_delta = right_eye - left_eye
    roll = jnp.degrees(jnp.arctan2(eye_delta[:, 1], eye_delta[:, 0]))

    eye_distance = jnp.linalg.norm(eye_delta, axis=-1)
    nose_offset_x = nose[:, 0] - eye_center[:, 0]
    safe_eye_dist = jnp.where(eye_distance > 0, eye_distance, 1.0)
    yaw = (
        jnp.degrees(jnp.arcsin(jnp.clip(nose_offset_x / safe_eye_dist, -1.0, 1.0)))
        * 2.0
    )

    mouth_center = (left_mouth + right_mouth) * 0.5
    face_height = mouth_center[:, 1] - eye_center[:, 1]
    safe_face_h = jnp.where(face_height != 0, face_height, 1.0)
    nose_offset_y = nose[:, 1] - eye_center[:, 1]
    pitch = (nose_offset_y / safe_face_h - 0.5) * 60.0

    return {"yaw": yaw, "pitch": pitch, "roll": roll}


def quality_check(
    det_scores: jax.Array,
    bboxes: jax.Array,
    landmarks: jax.Array,
    config: QualityConfig = QualityConfig(),
    aligned_faces: jax.Array | None = None,
    valid_mask: jax.Array | None = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Batched quality gate; the vectorized form of `FaceQualityFilter.is_valid`
    (face_recognition.py:123-158).

    det_scores [B], bboxes [B,4] (x1,y1,x2,y2), landmarks [B,5,2];
    aligned_faces [B,H,W,3] optional (needed when config.check_blur).
    valid_mask [B] bool marks which padded slots hold real detections.

    Returns (is_valid [B] bool, metrics dict of [B] float32 arrays with keys
    det_score, face_size, yaw, pitch, roll[, blur_score]).
    """
    det_scores = det_scores.astype(jnp.float32)
    bboxes = bboxes.astype(jnp.float32)

    face_w = bboxes[:, 2] - bboxes[:, 0]
    face_h = bboxes[:, 3] - bboxes[:, 1]
    face_size = jnp.minimum(face_w, face_h)
    pose = pose_angles(landmarks)

    metrics = {"det_score": det_scores, "face_size": face_size, **pose}

    ok = det_scores >= config.min_det_score
    ok &= face_size >= config.min_face_size
    ok &= jnp.abs(pose["yaw"]) <= config.max_yaw
    ok &= jnp.abs(pose["pitch"]) <= config.max_pitch
    ok &= jnp.abs(pose["roll"]) <= config.max_roll

    if config.check_blur and aligned_faces is not None:
        blur = laplacian_blur_score(aligned_faces)
        metrics["blur_score"] = blur
        ok &= blur >= config.blur_threshold

    if valid_mask is not None:
        ok &= valid_mask

    return ok, metrics
