"""CLI-level end-to-end: face_matcher --single_image with REAL detection.

Renders a scene, enrolls the detector-aligned crops, then drives the actual
CLI entrypoint with --detector_weights: the cascade re-detects the faces, the
(deterministic) embedder re-embeds them, and the gallery must match at
confidence ~1.0. Exercises the full user path with no stubs."""

import json
import os

import numpy as np
import pytest

from facerecognitionpipeline_tpu.gallery.manager import GalleryManager
from facerecognitionpipeline_tpu.models.detector import MTCNNDetector
from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder
from facerecognitionpipeline_tpu.pipeline.processor import FaceProcessor
from facerecognitionpipeline_tpu.train.detector_train import (
    make_identity,
    render_identity_scene,
)
from facerecognitionpipeline_tpu.utils.io import imwrite_rgb

WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pretrained", "mtcnn_synthetic.npz",
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(WEIGHTS), reason="trained detector weights not present"
)


@pytest.mark.slow
def test_face_matcher_cli_single_image(tmp_path, rng, capsys):
    # render a scene with one identity
    scene, boxes, lms, _ = render_identity_scene(
        [make_identity(5)], np.random.default_rng(2), size=160
    )
    scene_path = str(tmp_path / "scene.png")
    imwrite_rgb(scene_path, scene)

    # detect + align with the same pipeline the CLI will use, enroll the crop
    detector = MTCNNDetector(
        det_size=(640, 640), det_thresh=0.5, weights_path=WEIGHTS,
        stage_thresholds=(0.6, 0.6, 0.5), min_face_size=20,
    )
    processor = FaceProcessor(
        output_size=112, detector=detector,
        quality_filter_config={"min_det_score": 0.5, "min_face_size": 10,
                               "max_yaw": 90, "max_pitch": 90, "max_roll": 90,
                               "check_blur": False},
    )
    faces = processor.process_image(scene_path, return_all=True)
    assert faces, "trained detector found no faces in the rendered scene"

    embedder = FaceEmbedder(architecture="ir_micro")
    gallery = GalleryManager(gallery_path=str(tmp_path / "g.pkl"), verbose=False)
    gallery.add_student(
        "SYN0005", "Identity 5",
        embedder.extract_embeddings_batch([faces[0]["aligned_face"]]),
    )
    gallery.save()

    # drive the real CLI
    from facerecognitionpipeline_tpu.cli.face_matcher import main

    rc = main([
        "--single_image", scene_path,
        "--gallery_path", str(tmp_path / "g.pkl"),
        "--architecture", "ir_micro",
        "--detector_weights", WEIGHTS,
        "--threshold", "0.8",
        "--top_k", "1",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Recognized: Identity 5" in out

    # visualization artifact written next to the input
    viz_dir = tmp_path / "g_match_results"
    assert (viz_dir / "matched_scene.png").exists()
