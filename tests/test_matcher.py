"""End-to-end matcher slice: enroll synthetic faces, match tracks + images."""

import json
import os

import numpy as np
import pytest

from facerecognitionpipeline_tpu.gallery.manager import GalleryManager
from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder
from facerecognitionpipeline_tpu.pipeline.matcher import FaceMatcher
from facerecognitionpipeline_tpu.pipeline.processor import FaceProcessor
from tests.stubs import StubDetector, face_at


@pytest.fixture(scope="module")
def embedder():
    # ir_18 with random init: identical inputs -> identical embeddings, so
    # enroll-then-match of the same crops is a real end-to-end check.
    return FaceEmbedder(architecture="ir_18", model_type="adaface")


@pytest.fixture(scope="module")
def people(rng=None):
    r = np.random.default_rng(42)
    return {
        f"STU{i:04d}": r.integers(0, 256, (112, 112, 3), dtype=np.uint8)
        for i in range(3)
    }


@pytest.fixture
def gallery(tmp_path, embedder, people):
    g = GalleryManager(gallery_path=str(tmp_path / "students.pkl"), verbose=False)
    for sid, crop in people.items():
        emb = embedder.extract_embeddings_batch([crop])
        g.add_student(sid, f"Person {sid[-1]}", emb)
    return g


def _make_track(tmp_path, name, crop, n_frames=4):
    import cv2

    d = tmp_path / name
    d.mkdir()
    for i in range(n_frames):
        # PNG: lossless, so identical frames embed identically even with a
        # random-init backbone (jpeg noise would perturb untrained features).
        cv2.imwrite(str(d / f"frame_{i:03d}.png"),
                    cv2.cvtColor(crop, cv2.COLOR_RGB2BGR))
    with open(d / "metadata.json", "w") as f:
        json.dump({"track_id": name, "num_frames": n_frames}, f)
    return str(d)


def test_match_single_face_self(embedder, gallery, people):
    m = FaceMatcher(embedder=embedder, gallery=gallery, similarity_threshold=0.35)
    results = m.match_single_face(people["STU0001"], top_k=3)
    assert results[0][0] == "STU0001"
    # jpeg-free path: exact same pixels -> similarity ~1
    assert results[0][2] > 0.99


def test_match_track_consensus(tmp_path, embedder, gallery, people):
    track = _make_track(tmp_path, "track_001", people["STU0002"])
    m = FaceMatcher(embedder=embedder, gallery=gallery, similarity_threshold=0.35,
                    aggregation_method="consensus")
    result = m.match_track(track)
    assert result["recognized"]
    assert result["student_id"] == "STU0002"
    assert result["num_frames"] == 4
    assert result["confidence"] > 0.9
    assert len(result["frame_matches"]) == 4
    assert result["frame_matches"][0]["top_k_matches"]


@pytest.mark.parametrize("method", ["majority_vote", "avg_similarity", "max_similarity"])
def test_match_track_other_aggregations(tmp_path, embedder, gallery, people, method):
    track = _make_track(tmp_path, f"track_{method}", people["STU0000"])
    m = FaceMatcher(embedder=embedder, gallery=gallery, similarity_threshold=0.35,
                    aggregation_method=method)
    result = m.match_track(track)
    assert result["recognized"]
    assert result["student_id"] == "STU0000"


def test_match_track_below_threshold(tmp_path, embedder, gallery, rng):
    stranger = rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
    track = _make_track(tmp_path, "track_stranger", stranger)
    m = FaceMatcher(embedder=embedder, gallery=gallery, similarity_threshold=0.99)
    result = m.match_track(track)
    assert not result["recognized"]
    assert result["reason"] == "below_threshold"
    assert "best_candidate" in result


def test_match_track_missing_metadata(tmp_path, embedder, gallery):
    d = tmp_path / "track_empty"
    d.mkdir()
    m = FaceMatcher(embedder=embedder, gallery=gallery)
    assert m.match_track(str(d)) is None


def test_process_capture_directory(tmp_path, embedder, gallery, people):
    _make_track(tmp_path, "track_001", people["STU0000"])
    _make_track(tmp_path, "track_002", people["STU0001"])
    m = FaceMatcher(embedder=embedder, gallery=gallery, similarity_threshold=0.35,
                    model_type="adaface", architecture="ir_18")
    summary = m.process_capture_directory(str(tmp_path))
    assert summary["total_tracks"] == 2
    assert summary["recognized"] == 2
    assert summary["recognition_rate"] == 100.0
    assert summary["unique_students"] == 2
    # artifacts: per-track result + model-scoped summary
    assert os.path.exists(tmp_path / "track_001" / "recognition_result.json")
    assert os.path.exists(
        tmp_path / "adaface_ir_18_results" / "recognition_summary.json"
    )
    with open(tmp_path / "track_001" / "recognition_result.json") as f:
        r = json.load(f)
    assert r["recognized"] and "frame_matches" in r


def test_match_single_image_with_stub_detector(tmp_path, embedder, gallery, people, rng):
    """Full detect->align->embed->match on one image via stub detection."""
    import cv2

    # paste STU0000's crop into a frame at the template location (100,100)
    frame = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    proc = FaceProcessor(
        output_size=112,
        detector=StubDetector([face_at(100, 100, det_score=0.9)]),
        quality_filter_config={"check_blur": False, "min_det_score": 0.5,
                               "min_face_size": 20},
    )
    path = str(tmp_path / "scene.png")
    cv2.imwrite(path, cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))

    m = FaceMatcher(embedder=embedder, gallery=gallery, similarity_threshold=0.35,
                    processor=proc)
    result = m.match_single_image(path, top_k=2, save_visualization=True)
    assert result["num_faces"] == 1
    match = result["matches"][0]
    assert len(match["top_matches"]) == 2
    assert "quality_metrics" in match
    assert os.path.exists(result["visualization_path"])


def test_invalid_aggregation(tmp_path):
    with pytest.raises(ValueError):
        FaceMatcher(gallery=GalleryManager(
            gallery_path=str(tmp_path / "g.pkl"), verbose=False),
            embedder=object(), aggregation_method="bogus")
