"""FaceProcessor: detect -> align -> quality-gate, the L1 perception core.

Rebuild of the reference `FaceProcessor` (`face_recognition.py:160-216`) with
the same per-face result schema ({aligned_face, bbox, landmarks, det_score,
quality_metrics, is_valid}, best-face selection by det_score x blur_score)
but a TPU-first execution model:

* detection is the jitted MTCNN cascade (`models/detector.py`),
* ALL faces of an image are aligned by one batched warp and quality-gated by
  one masked kernel (`_align_and_gate`, jitted per image shape) — the
  reference loops per face through cv2,
* `process_frames_device` keeps the whole detect->align->gate pipeline on
  device for serving (no host round-trips between stages).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from facerecognitionpipeline_tpu.ops.quality import QualityConfig, quality_check
from facerecognitionpipeline_tpu.ops.warp import align_faces, reference_template
from facerecognitionpipeline_tpu.utils.io import imread_rgb


class FaceProcessor:
    def __init__(
        self,
        output_size: int = 224,
        det_size: tuple[int, int] = (640, 640),
        det_thresh: float = 0.5,
        quality_filter_config: Optional[Dict] = None,
        detector=None,
        max_faces: int = 32,
    ):
        if detector is None:
            from facerecognitionpipeline_tpu.models.detector import MTCNNDetector

            detector = MTCNNDetector(
                det_size=det_size, det_thresh=det_thresh, max_faces=max_faces
            )
        self.detector = detector
        self.output_size = output_size
        self.template = jnp.asarray(reference_template(output_size))
        self.quality_config = QualityConfig(**(quality_filter_config or {}))
        self._gate = jax.jit(self._align_and_gate)

    # ------------------------------------------------------------- device op

    def _align_and_gate(self, image, landmarks, bboxes, scores, valid):
        """One image + padded detections -> aligned crops + gate verdicts."""
        aligned = align_faces(image, landmarks, self.template, self.output_size)
        aligned = jnp.clip(jnp.round(aligned), 0, 255)
        ok, metrics = quality_check(
            scores,
            bboxes,
            landmarks,
            self.quality_config,
            aligned_faces=aligned if self.quality_config.check_blur else None,
            valid_mask=valid,
        )
        return aligned, ok, metrics

    def process_frames_device(self, frames: jax.Array):
        """Fully on-device batch path for serving: [B,H,W,3] det_size frames
        -> (detections dict, aligned [B,F,S,S,3], ok [B,F], metrics)."""
        det = self.detector.detect_device(frames)
        gate = jax.vmap(self._align_and_gate)
        aligned, ok, metrics = gate(
            frames.astype(jnp.float32),
            det["landmarks"],
            det["bboxes"],
            det["scores"],
            det["valid"],
        )
        return det, aligned, ok, metrics

    # --------------------------------------------------------------- host API

    def process_image(self, image_path: str, return_all: bool = False) -> List[Dict]:
        """Read from disk (any format cv2/PIL handles) then `process_numpy`
        (reference face_recognition.py:174-182)."""
        image = imread_rgb(image_path)
        if image is None:
            raise ValueError(f"Could not load image: {image_path}")
        return self.process_numpy(image, return_all)

    def process_numpy(self, image_rgb: np.ndarray, return_all: bool = False) -> List[Dict]:
        """RGB array -> per-face dicts, sorted by det_score * blur_score, best
        face only unless return_all (reference face_recognition.py:184-216)."""
        if image_rgb.ndim == 2:
            image_rgb = np.stack([image_rgb] * 3, axis=-1)
        faces = self.detector.detect(image_rgb)
        if not faces:
            return []

        f = len(faces)
        landmarks = np.stack([fc["landmarks"] for fc in faces]).astype(np.float32)
        bboxes = np.stack([fc["bbox"] for fc in faces]).astype(np.float32)
        scores = np.array([fc["det_score"] for fc in faces], np.float32)

        aligned, ok, metrics = jax.device_get(
            self._gate(
                jnp.asarray(image_rgb, dtype=jnp.float32),
                jnp.asarray(landmarks),
                jnp.asarray(bboxes),
                jnp.asarray(scores),
                jnp.ones(f, bool),
            )
        )
        aligned = aligned.astype(np.uint8)

        results = []
        for i, face in enumerate(faces):
            qm = {k: float(v[i]) for k, v in metrics.items()}
            is_valid = bool(ok[i])
            if is_valid or return_all:
                results.append(
                    {
                        "aligned_face": aligned[i],
                        "bbox": np.asarray(face["bbox"], np.int32),
                        "landmarks": landmarks[i],
                        "det_score": float(scores[i]),
                        "quality_metrics": qm,
                        "is_valid": is_valid,
                    }
                )

        results.sort(
            key=lambda r: r["det_score"] * r["quality_metrics"].get("blur_score", 1000),
            reverse=True,
        )
        if not return_all and results:
            return [results[0]]
        return results
