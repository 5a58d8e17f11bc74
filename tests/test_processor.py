"""FaceProcessor pipeline tests with a deterministic stub detector."""

import numpy as np
import pytest

from facerecognitionpipeline_tpu.pipeline.processor import FaceProcessor
from tests.stubs import StubDetector, face_at


@pytest.fixture
def image(rng):
    # structured image so blur scores differ from zero
    img = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
    return img


def test_process_returns_best_face_only(image):
    detector = StubDetector(
        [face_at(100, 100, det_score=0.95), face_at(300, 200, det_score=0.7)]
    )
    proc = FaceProcessor(
        output_size=112,
        detector=detector,
        quality_filter_config={"min_det_score": 0.5, "min_face_size": 20,
                               "check_blur": False},
    )
    results = proc.process_numpy(image)
    assert len(results) == 1
    assert results[0]["det_score"] == pytest.approx(0.95)
    assert results[0]["aligned_face"].shape == (112, 112, 3)
    assert results[0]["aligned_face"].dtype == np.uint8
    assert results[0]["is_valid"]


def test_process_return_all_includes_invalid(image):
    detector = StubDetector(
        [face_at(100, 100, det_score=0.95), face_at(300, 200, det_score=0.3)]
    )
    cfg = {"min_det_score": 0.5, "min_face_size": 20, "check_blur": False}
    proc = FaceProcessor(output_size=112, detector=detector, quality_filter_config=cfg)
    all_results = proc.process_numpy(image, return_all=True)
    assert len(all_results) == 2
    assert [r["is_valid"] for r in all_results].count(False) == 1
    # without return_all, the invalid face is dropped
    assert len(proc.process_numpy(image)) == 1


def test_quality_metrics_present(image):
    proc = FaceProcessor(
        output_size=112,
        detector=StubDetector([face_at(150, 150)]),
        quality_filter_config={"check_blur": True, "blur_threshold": 0.0,
                               "min_det_score": 0.5, "min_face_size": 20},
    )
    r = proc.process_numpy(image)[0]
    qm = r["quality_metrics"]
    assert {"det_score", "face_size", "yaw", "pitch", "roll", "blur_score"} <= set(qm)
    assert abs(qm["yaw"]) < 1.0 and abs(qm["roll"]) < 1.0  # template-aligned face


def test_no_faces(image):
    proc = FaceProcessor(output_size=112, detector=StubDetector([]))
    assert proc.process_numpy(image) == []


def test_process_image_from_disk(tmp_path, image):
    import cv2

    path = str(tmp_path / "img.png")
    cv2.imwrite(path, cv2.cvtColor(image, cv2.COLOR_RGB2BGR))
    proc = FaceProcessor(
        output_size=112,
        detector=StubDetector([face_at(100, 100)]),
        quality_filter_config={"check_blur": False, "min_det_score": 0.5,
                               "min_face_size": 20},
    )
    results = proc.process_image(path)
    assert len(results) == 1
    with pytest.raises(ValueError):
        proc.process_image(str(tmp_path / "missing.png"))


def test_grayscale_input(image):
    proc = FaceProcessor(
        output_size=112,
        detector=StubDetector([face_at(100, 100)]),
        quality_filter_config={"check_blur": False, "min_det_score": 0.5,
                               "min_face_size": 20},
    )
    gray = image[..., 0]
    results = proc.process_numpy(gray)
    assert len(results) == 1
