"""Full evaluation pipeline driver: corpus pickles -> exports."""

import json
import os
import pickle

import numpy as np

from facerecognitionpipeline_tpu.evalharness.pipeline import (
    run_complete_evaluation_pipeline,
)


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _write_corpus(root, model_name, rng, shift=0.0):
    d = root / "embeddings" / model_name
    d.mkdir(parents=True)
    centers = _norm(rng.normal(size=(4, 512)).astype(np.float32) + shift)

    def cluster(i, n):
        return _norm(centers[i] + 0.05 * rng.normal(size=(n, 512)).astype(np.float32))

    for stem, n in (("gallery_one-shot_base", 1), ("gallery_few-shot_base", 3),
                    ("gallery_one-shot_augmented", 4),
                    ("gallery_few-shot_augmented", 8)):
        gal = {f"p{i}": {"embeddings": cluster(i, n)} for i in range(4)}
        with open(d / f"{stem}.pkl", "wb") as f:
            pickle.dump(gal, f)

    probes = {"all": {f"p{i}": {"embeddings": cluster(i, 2)} for i in range(4)}}
    with open(d / "probe_positive_unsegmented.pkl", "wb") as f:
        pickle.dump(probes, f)
    segmented = {"pose_easy": probes["all"]}
    with open(d / "probe_positive_segmented.pkl", "wb") as f:
        pickle.dump(segmented, f)
    negatives = {
        "lfw": {"embeddings": _norm(rng.normal(size=(10, 512)).astype(np.float32)),
                "filenames": [f"lfw_{i}.jpg" for i in range(10)]}
    }
    with open(d / "probe_negative.pkl", "wb") as f:
        pickle.dump(negatives, f)


def test_run_complete_pipeline(tmp_path, rng):
    _write_corpus(tmp_path, "adaface_ir_micro", rng)
    _write_corpus(tmp_path, "arcface_ir_micro", rng, shift=0.1)
    out_dir = tmp_path / "evaluation"

    result = run_complete_evaluation_pipeline(
        models=["adaface_ir_micro", "arcface_ir_micro", "missing_model"],
        embeddings_root=str(tmp_path / "embeddings"),
        output_dir=str(out_dir),
        thresholds=[0.2, 0.5, 0.8],
        aggregations=("mean", "max"),
    )
    assert set(result["results"]) == {"adaface_ir_micro", "arcface_ir_micro"}

    model = result["results"]["adaface_ir_micro"]
    assert set(model["basic_probe"]) == {
        "oneshot_base", "oneshot_augmented", "fewshot_base", "fewshot_augmented",
    }
    assert "verification" in model and model["verification"]
    assert "pose_easy" in model["segmented"]["oneshot_base"]

    # exports
    for fname in ("evaluation_results.json", "identification_summary.csv",
                  "verification_summary.csv", "gallery_strategies.csv",
                  "statistical_comparison.csv", "executive_summary.txt",
                  "identification_curves.png"):
        assert (out_dir / fname).exists(), fname

    with open(out_dir / "evaluation_results.json") as f:
        blob = json.load(f)
    ident = blob["identification_summary"]
    # 2 models x 4 galleries x 2 aggregations
    assert len(ident) == 16
    assert all(row["Rank-1"] == 1.0 for row in ident)  # separable data
    assert blob["statistical_comparison"]  # pairwise test present
    assert blob["gallery_strategies"][0]["Best_Rank1"] == 1.0
