"""End-to-end enrollment: image dirs -> gallery with verification."""

import os

import cv2
import numpy as np
import pytest

from facerecognitionpipeline_tpu.gallery.manager import GalleryManager
from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder
from facerecognitionpipeline_tpu.pipeline.enrollment import StudentEnrollment
from facerecognitionpipeline_tpu.pipeline.processor import FaceProcessor
from tests.stubs import StubDetector, face_at


@pytest.fixture(scope="module")
def embedder():
    return FaceEmbedder(architecture="ir_micro")


def _write_student_dir(root, name, rng, n_images=4):
    d = root / name
    d.mkdir(parents=True)
    base = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    for i in range(n_images):
        img = base.copy()
        img[:50, :50] = rng.integers(0, 256, (50, 50, 3))  # slight variation
        cv2.imwrite(str(d / f"img_{i:02d}.png"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return str(d)


@pytest.fixture
def enrollment(tmp_path, embedder, rng):
    processor = FaceProcessor(
        output_size=112,
        detector=StubDetector([face_at(200, 150, scale=1.5, det_score=0.9)]),
        quality_filter_config={"min_det_score": 0.5, "min_face_size": 20,
                               "check_blur": False},
    )
    return StudentEnrollment(
        gallery_path=str(tmp_path / "gallery" / "students.pkl"),
        min_faces_per_student=2,
        max_faces_per_student=3,
        architecture="ir_micro",
        processor=processor,
        embedder=embedder,
        gallery=GalleryManager(
            gallery_path=str(tmp_path / "gallery" / "students.pkl"),
            aggregation_method="weighted_mean",
            verbose=False,
        ),
    )


def test_enroll_from_directory(tmp_path, enrollment, rng):
    root = tmp_path / "enroll"
    for name in ("alice", "bob"):
        _write_student_dir(root, name, rng)

    summary = enrollment.enroll_from_directory(str(root))
    assert summary["successful"] == 2
    assert summary["failed"] == 0
    assert summary["gallery_stats"]["num_students"] == 2
    # x8 augmentation on up to 3 kept faces
    rec = enrollment.gallery.get_student("STU0001")
    assert rec.num_samples == 3 * 8
    assert rec.metadata["augmentation_per_face"] == 8
    assert "avg_similarity" in rec.metadata
    # self-verification ran
    assert summary["verification"] is not None
    assert summary["verification"]["total"] == 2
    # gallery persisted
    assert os.path.exists(enrollment.gallery.gallery_path)


def test_enroll_insufficient_faces(tmp_path, enrollment, rng):
    root = tmp_path / "enroll2"
    _write_student_dir(root, "carol", rng, n_images=1)
    enrollment.min_faces = 3
    ok, info = enrollment.process_student_directory(str(root / "carol"))
    assert not ok
    assert info["error"] == "insufficient_faces"


def test_enroll_empty_directory(tmp_path, enrollment):
    d = tmp_path / "enroll3" / "dave"
    d.mkdir(parents=True)
    ok, info = enrollment.process_student_directory(str(d))
    assert not ok and info["error"] == "no_images"


def test_backup_naming(tmp_path, enrollment, rng):
    root = tmp_path / "enroll4"
    _write_student_dir(root, "erin", rng)
    enrollment.enroll_from_directory(str(root))
    path = enrollment.backup(str(tmp_path / "backups"))
    assert "adaface_ir_micro_backup_" in os.path.basename(path)
