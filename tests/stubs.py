"""Deterministic stub detector for pipeline tests (no model weights needed)."""

import numpy as np

from facerecognitionpipeline_tpu.ops.warp import reference_template


def face_at(x: float, y: float, scale: float = 1.0, det_score: float = 0.9):
    """A detection whose landmarks are the 112-template placed at (x, y)."""
    lms = reference_template(112) * scale + np.array([x, y], np.float32)
    x1, y1 = lms.min(axis=0) - 15 * scale
    x2, y2 = lms.max(axis=0) + 15 * scale
    return {
        "bbox": np.array([x1, y1, x2, y2], np.int32),
        "landmarks": lms.astype(np.float32),
        "det_score": det_score,
        "pose": None,
        "age": None,
        "gender": None,
    }


class StubDetector:
    """Returns a fixed detection list regardless of input."""

    def __init__(self, detections, max_faces: int = 8):
        self.detections = detections
        self.max_faces = max_faces
        self.pretrained = True

    def detect(self, image):
        return list(self.detections)
