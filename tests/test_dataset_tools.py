"""Dataset tooling: preprocessor, segmenter, labeler, lfw sampler."""

import json
import os

import cv2
import numpy as np
import pytest

from facerecognitionpipeline_tpu.cli.lfw_impostor_helper import sample_impostors
from facerecognitionpipeline_tpu.gallery.manager import GalleryManager
from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder
from facerecognitionpipeline_tpu.pipeline.labeling import ProbeLabeler
from facerecognitionpipeline_tpu.pipeline.preprocessing import DatasetPreprocessor
from facerecognitionpipeline_tpu.pipeline.processor import FaceProcessor
from facerecognitionpipeline_tpu.pipeline.segmentation import ProbeSegmenter
from tests.stubs import StubDetector, face_at


def _write_png(path, rng, shape=(480, 640, 3)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return img


# ------------------------------------------------------------- preprocessor


def test_preprocessor_angle_folders(tmp_path, rng):
    root = tmp_path / "classes"
    for cls in ("10A", "10B"):
        for angle in ("center", "left"):
            _write_png(str(root / cls / angle / "photo1.png"), rng)
    proc = FaceProcessor(
        output_size=112,
        detector=StubDetector(
            [face_at(100, 100, det_score=0.9), face_at(350, 220, det_score=0.8)]
        ),
        quality_filter_config={"min_det_score": 0.3, "min_face_size": 30,
                               "max_yaw": 90, "max_pitch": 90, "max_roll": 90,
                               "check_blur": True, "blur_threshold": 0.0},
    )
    pre = DatasetPreprocessor(processor=proc)
    out = tmp_path / "out"
    result = pre.process_dataset(str(root), str(out))
    assert result["classes"] == 2
    assert result["images"] == 4
    assert result["faces"] == 8  # 2 faces per image

    with open(result["metadata_path"]) as f:
        meta = json.load(f)
    assert len(meta) == 8
    entry = meta[0]
    assert {"filename", "class_id", "angle", "det_score", "yaw", "pitch",
            "roll", "blur_score", "face_size", "bbox"} <= set(entry)
    # crops written with standardized names
    assert os.path.exists(out / "probe_positive" / meta[0]["filename"])
    assert meta[0]["filename"].startswith("10A_center_001_face")


def test_preprocessor_angle_from_filename(tmp_path, rng):
    root = tmp_path / "classes2"
    _write_png(str(root / "10C" / "girl_left_01.png"), rng)
    _write_png(str(root / "10C" / "boy_right_01.png"), rng)
    _write_png(str(root / "10C" / "frontal.png"), rng)
    proc = FaceProcessor(
        output_size=112,
        detector=StubDetector([face_at(100, 100, det_score=0.9)]),
        quality_filter_config={"check_blur": False, "min_det_score": 0.3,
                               "min_face_size": 30},
    )
    pre = DatasetPreprocessor(processor=proc)
    result = pre.process_dataset(str(root), str(tmp_path / "out2"))
    assert result["angle_counts"] == {"center": 1, "left": 1, "right": 1}


# --------------------------------------------------------------- segmenter


@pytest.fixture
def metadata_and_files(tmp_path, rng):
    probe_dir = tmp_path / "probes"
    probe_dir.mkdir()
    rows = []
    specs = [
        # name, yaw, pitch, blur, det, size
        ("easy_sharp_large", 3, 3, 900, 0.95, 200),
        ("easy_blurry_small", 5, 2, 10, 0.9, 50),
        ("medium_pose", 20, 10, 500, 0.8, 100),
        ("hard_pose", 50, 30, 400, 0.75, 120),
        ("low_det", 2, 2, 600, 0.5, 160),
    ]
    for i, (name, yaw, pitch, blur, det, size) in enumerate(specs):
        fname = f"{name}.jpg"
        _write_png(str(probe_dir / fname), rng, shape=(112, 112, 3))
        rows.append({
            "filename": fname, "class_id": "X", "angle": "center",
            "yaw": yaw, "pitch": pitch, "blur_score": blur,
            "det_score": det, "face_size": size,
        })
    meta_path = tmp_path / "meta.json"
    with open(meta_path, "w") as f:
        json.dump(rows, f)
    return str(probe_dir), str(meta_path), rows


def test_segmenter_buckets(tmp_path, metadata_and_files):
    probe_dir, meta_path, rows = metadata_and_files
    seg = ProbeSegmenter()
    out = str(tmp_path / "segmented")
    result = seg.segment_dataset(probe_dir, meta_path, out)
    assert result["processed"] == 5
    counts = result["category_counts"]
    assert counts["pose_hard"] == 1
    assert counts["pose_medium"] == 1
    assert counts["pose_easy"] == 3
    assert counts["low_quality"] == 1
    assert counts["face_large"] == 2  # sizes 200 and 160 are >= 150
    # per-category metadata json exists
    assert os.path.exists(os.path.join(out, "pose_hard", "pose_hard_metadata.json"))
    with open(os.path.join(out, "pose_hard", "pose_hard_metadata.json")) as f:
        hard = json.load(f)
    assert hard[0]["filename"] == "hard_pose.jpg"
    # images actually copied
    assert os.path.exists(os.path.join(out, "pose_medium", "medium_pose.jpg"))


def test_filename_mapping_no_cross_class_aliasing(tmp_path, rng):
    """'1_center_001.jpg' metadata must not bind to class-11's labeled file
    even though '11_center_001.jpg' string-ends with it."""
    probe_dir = tmp_path / "probes"
    probe_dir.mkdir()
    for f in ("Jane_11_center_001.jpg", "Amy_1_center_001.jpg"):
        _write_png(str(probe_dir / f), rng, shape=(16, 16, 3))
    seg = ProbeSegmenter()
    mapping = seg.build_filename_mapping(
        str(probe_dir),
        [{"filename": "1_center_001.jpg"}, {"filename": "11_center_001.jpg"}],
    )
    assert mapping["1_center_001.jpg"] == "Amy_1_center_001.jpg"
    assert mapping["11_center_001.jpg"] == "Jane_11_center_001.jpg"


def test_blur_threshold_percentile_boundaries():
    """sharp_percentile=0 -> nothing sharp; blurry_percentile=100 -> all
    blurry (the reference's 0-fallback inverted both)."""
    meta = [{"blur_score": float(v)} for v in (10, 20, 30, 40)]
    seg = ProbeSegmenter(blur_sharp_percentile=0, blur_blurry_percentile=100)
    seg.compute_blur_thresholds(meta)
    cats = [seg.categorize_face(m) for m in meta]
    assert not any("blur_sharp" in c for c in cats)
    assert all("blur_blurry" in c for c in cats)


def test_segmenter_symlink_mode(tmp_path, metadata_and_files):
    probe_dir, meta_path, _ = metadata_and_files
    seg = ProbeSegmenter()
    out = str(tmp_path / "seg_link")
    seg.segment_dataset(probe_dir, meta_path, out, copy_files=False)
    link = os.path.join(out, "pose_hard", "hard_pose.jpg")
    assert os.path.islink(link) and os.path.exists(link)


# ----------------------------------------------------------------- labeler


def test_probe_labeler(tmp_path, rng):
    embedder = FaceEmbedder(architecture="ir_micro")
    gallery = GalleryManager(gallery_path=str(tmp_path / "g.pkl"), verbose=False)

    crops = {f"S{i}": rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
             for i in range(2)}
    for sid, crop in crops.items():
        gallery.add_student(sid, f"Person {sid}", embedder.extract_embeddings_batch([crop]))

    probe_dir = tmp_path / "probes"
    probe_dir.mkdir()
    # known probe: exact pixels of S0 (PNG = lossless -> confidence ~1 = SURE)
    cv2.imwrite(str(probe_dir / "known.png"),
                cv2.cvtColor(crops["S0"], cv2.COLOR_RGB2BGR))
    # stranger: random noise (random-init embedder -> low similarity)
    cv2.imwrite(str(probe_dir / "stranger.png"),
                cv2.cvtColor(rng.integers(0, 256, (112, 112, 3), dtype=np.uint8),
                             cv2.COLOR_RGB2BGR))

    labeler = ProbeLabeler(
        embedder=embedder, gallery=gallery,
        sure_threshold=0.9, unsure_threshold=0.5,
        model_type="adaface", architecture="ir_micro",
    )
    summary = labeler.process_probe_directory(str(probe_dir))
    assert summary["processed"] == 2
    assert summary["label_distribution"]["SURE"] == 1

    out_dir = str(probe_dir) + "_labeled"
    with open(os.path.join(out_dir, "labeling_results.json")) as f:
        blob = json.load(f)
    assert blob["summary"]["settings"]["architecture"] == "ir_micro"
    known = next(r for r in blob["results"] if r["filename"] == "known.png")
    assert known["label"] == "SURE" and known["matched_student_id"] == "S0"
    assert os.path.exists(known["labeled_path"])
    assert os.path.basename(known["labeled_path"]).startswith("Person S0_")


# ------------------------------------------------------------- lfw sampler


def test_lfw_impostor_sampler(tmp_path, rng):
    lfw = tmp_path / "lfw"
    for i in range(10):
        _write_png(str(lfw / f"Person_{i}" / "img1.png"), rng, shape=(64, 64, 3))
    out = str(tmp_path / "neg")
    n = sample_impostors(str(lfw), out, num_identities=5, seed=1)
    assert n == 5
    files = sorted(os.listdir(out))
    assert files[0].startswith("lfw_000")
    # deterministic given the seed
    out2 = str(tmp_path / "neg2")
    sample_impostors(str(lfw), out2, num_identities=5, seed=1)
    assert sorted(os.listdir(out2)) == files
