"""EmbeddingGenerator corpus artifacts on a synthetic dataset tree."""

import json
import os
import pickle

import cv2
import numpy as np
import pytest

from facerecognitionpipeline_tpu.pipeline.corpus import (
    EmbeddingGenerator,
    extract_name_from_filename,
)
from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder
from facerecognitionpipeline_tpu.pipeline.processor import FaceProcessor
from tests.stubs import StubDetector, face_at


def test_extract_name():
    assert extract_name_from_filename("Jane_Doe_001_face0.jpg") == "Jane_Doe"
    assert extract_name_from_filename("bob_12.png") == "bob"
    assert extract_name_from_filename("123.png") == "123"
    assert extract_name_from_filename("single.jpg") == "single"


@pytest.fixture(scope="module")
def embedder():
    return FaceEmbedder(architecture="ir_micro")


def _png(path, rng, shape=(480, 640, 3)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))


def test_generate_all(tmp_path, embedder, rng):
    dataset = tmp_path / "dataset"
    output = tmp_path / "out"
    # enrollment trees
    for etype, n in (("one-shot", 1), ("few-shot", 3)):
        for person in ("Jane_Doe", "Bob_Roe"):
            for i in range(n):
                _png(str(dataset / "enrollment" / etype / person / f"img{i}.png"), rng)
    # probe trees (pre-aligned 112x112 crops; names carry identity)
    for fname in ("Jane_Doe_001_face0.png", "Bob_Roe_001_face0.png"):
        _png(str(output / "probe_labeled" / "positive" / fname), rng, (112, 112, 3))
    _png(str(output / "probe_labeled" / "segmented" / "pose_easy" /
             "Jane_Doe_002_face0.png"), rng, (112, 112, 3))
    # 'baseline' is what the segmenter actually emits (the reference's
    # embedding generator looked for 'high_quality' and dropped the bucket)
    _png(str(output / "probe_labeled" / "segmented" / "baseline" /
             "Bob_Roe_002_face0.png"), rng, (112, 112, 3))
    # negative dir deliberately mixes sizes: LFW 250x250 next to real crops
    _png(str(output / "probe_labeled" / "negative" / "lfw_000.png"), rng, (250, 250, 3))
    _png(str(output / "probe_labeled" / "negative" / "stranger_01.png"), rng, (112, 112, 3))

    processor = FaceProcessor(
        output_size=112,
        detector=StubDetector([face_at(100, 100, det_score=0.9)]),
        quality_filter_config={"min_det_score": 0.5, "min_face_size": 40,
                               "check_blur": False},
    )
    gen = EmbeddingGenerator(
        model_type="adaface", architecture="ir_micro",
        dataset_root=str(dataset), output_root=str(output),
        embedder=embedder, processor=processor,
    )
    summary = gen.generate_all_embeddings()

    assert summary["gallery"]["one_shot_base_persons"] == 2
    assert summary["gallery"]["few_shot_augmented_persons"] == 2
    assert summary["probe_positive"]["unsegmented_categories"] == ["all"]
    assert "pose_easy" in summary["probe_positive"]["segmented_categories"]
    assert "baseline" in summary["probe_positive"]["segmented_categories"]
    assert summary["probe_negative"]["lfw_images"] == 1
    assert summary["probe_negative"]["real_images"] == 1

    out_dir = output / "embeddings" / "adaface_ir_micro"
    # pickle + json mirrors for every artifact
    for stem in ("gallery_one-shot_base", "gallery_few-shot_augmented",
                 "probe_positive_unsegmented", "probe_positive_segmented",
                 "probe_negative"):
        assert (out_dir / f"{stem}.pkl").exists()
        assert (out_dir / f"{stem}.json").exists()
    assert (out_dir / "generation_summary.json").exists()

    with open(out_dir / "gallery_few-shot_augmented.pkl", "rb") as f:
        gal = pickle.load(f)
    rec = gal["Jane_Doe"]
    assert rec["num_images"] == 3
    assert rec["num_embeddings"] == 24  # 3 faces x 8 augmentations
    assert rec["embeddings"].shape == (24, 512)
    assert rec["augmented"] is True

    with open(out_dir / "probe_positive_unsegmented.pkl", "rb") as f:
        probes = pickle.load(f)
    assert set(probes["all"]) == {"Jane_Doe", "Bob_Roe"}
    assert probes["all"]["Jane_Doe"]["embeddings"].shape == (1, 512)

    # JSON mirror is loadable and structurally equal
    with open(out_dir / "probe_negative.json") as f:
        neg = json.load(f)
    assert len(neg["lfw"]["embeddings"]) == 1
