"""Live app + camera capture on synthetic sources (headless)."""

import json
import os

import numpy as np
import pytest

from facerecognitionpipeline_tpu.gallery.manager import GalleryManager
from facerecognitionpipeline_tpu.pipeline.processor import FaceProcessor
from facerecognitionpipeline_tpu.serve.capture import CameraFaceCapture
from facerecognitionpipeline_tpu.serve.live import LiveFaceRecognition
from facerecognitionpipeline_tpu.serve.server import FaceRecognitionServer
from tests.stubs import StubDetector, face_at
from tests.test_server import FakeEngine


def test_capture_accumulates_and_saves(tmp_path):
    processor = FaceProcessor(
        output_size=112,
        detector=StubDetector([face_at(150, 120, det_score=0.95)]),
        quality_filter_config={"min_det_score": 0.5, "min_face_size": 20,
                               "check_blur": True, "blur_threshold": 0.0},
    )
    cap = CameraFaceCapture(
        synthetic=True,
        output_dir=str(tmp_path / "captures"),
        target_frames=3,
        skip_frames=1,
        min_quality_score=0.3,
        max_frames=5,
        display=False,
        processor=processor,
    )
    summary = cap.run()
    assert summary["total_frames_processed"] == 5
    assert summary["completed_tracks"] >= 1
    track_dir = tmp_path / "captures" / "track_001"
    assert (track_dir / "metadata.json").exists()
    with open(tmp_path / "captures" / "session_summary.json") as f:
        blob = json.load(f)
    assert blob["completed_tracks"] == summary["completed_tracks"]


def test_live_app_recognizes_and_finalizes(tmp_path, rng):
    gallery = GalleryManager(gallery_path=str(tmp_path / "g.pkl"), verbose=False)
    emb = rng.normal(size=(2, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    gallery.add_student("STU0000", "Student 0", emb)
    gallery.add_student("STU0001", "Student 1", emb[::-1])

    core = FaceRecognitionServer(
        gallery=gallery,
        similarity_threshold=0.5,
        output_dir=str(tmp_path / "sessions"),
        engine=FakeEngine(gallery),
        max_recognition_attempts=2,
    )
    app = LiveFaceRecognition(
        core=core,
        session_name="live_test",
        synthetic=True,
        frame_skip=1,
        max_frames=4,
        display=False,
    )
    assert app.run() == 0

    session_dir = tmp_path / "sessions" / "live_test"
    with open(session_dir / "attendance.json") as f:
        att = json.load(f)
    assert att["recognized"] and att["recognized"][0]["student_id"] == "STU0000"
    with open(session_dir / "session.json") as f:
        sess = json.load(f)
    assert sess["status"] == "completed"
    assert sess["statistics"]["total_frames_processed"] == 4
    assert (session_dir / "performance_report_server.json").exists()


def test_live_frame_skip_composes_with_recognition_interval(tmp_path, rng):
    """--frame_skip must not starve recognition: interval stays in CAPTURED-
    frame units (the reference processes every frame), so skip 7 x interval
    30 must still attempt within ~30 captured frames — under raw-count
    modulo gating it attempted only at lcm(7,30)=210."""
    gallery = GalleryManager(gallery_path=str(tmp_path / "g.pkl"), verbose=False)
    emb = rng.normal(size=(2, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    gallery.add_student("STU0000", "Student 0", emb)

    core = FaceRecognitionServer(
        gallery=gallery,
        similarity_threshold=0.5,
        output_dir=str(tmp_path / "sessions"),
        engine=FakeEngine(gallery),
        recognition_interval=30,
    )
    app = LiveFaceRecognition(
        core=core,
        session_name="skip_test",
        synthetic=True,
        frame_skip=7,
        max_frames=49,  # 7 processed frames; raw%30==0 never processed
        display=False,
    )
    assert core.recognition_interval == 4  # 30 captured // 7 skip
    assert app.run() == 0
    with open(tmp_path / "sessions" / "skip_test" / "attendance.json") as f:
        att = json.load(f)
    assert att["recognized"], "recognition starved by frame_skip composition"
