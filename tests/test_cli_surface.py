"""CLI surface: every tool parses --help and its reference flag vocabulary."""

import importlib

import pytest

CLI_MODULES = [
    "face_matcher",
    "enroll_students",
    "dataset_preprocessor",
    "segment_dataset",
    "probe_labeler",
    "embedding_generator",
    "lfw_impostor_helper",
    "label_rename_utility",
    "evaluate_models",
    "train_embedder",
    "detect_faces",
]

SERVE_MODULES = {
    "facerecognitionpipeline_tpu.serve.server": [
        "--gallery_path", "--threshold", "--session_name", "--host", "--port",
        "--model_type", "--architecture", "--recognition_interval",
        "--max_attempts", "--quantize", "--embed_budget", "--transport",
        "--max_requests", "--legacy_faces_route", "--gallery_quantize",
    ],
    "facerecognitionpipeline_tpu.serve.client": [
        "--server", "--session_name", "--frame_skip", "--max_frames",
    ],
    "facerecognitionpipeline_tpu.serve.live": [
        "--gallery_path", "--threshold", "--recognition_interval",
        "--quantize", "--embed_budget",
    ],
    "facerecognitionpipeline_tpu.serve.capture": [
        "--camera_id", "--skip_frames", "--target_frames",
    ],
}


@pytest.mark.parametrize("name", CLI_MODULES)
def test_cli_help_parses(name):
    mod = importlib.import_module(f"facerecognitionpipeline_tpu.cli.{name}")
    parser = mod.build_parser()
    help_text = parser.format_help()
    assert "--" in help_text


@pytest.mark.parametrize("modname", sorted(SERVE_MODULES))
def test_serve_flag_vocabulary(modname):
    mod = importlib.import_module(modname)
    help_text = mod.build_parser().format_help()
    for flag in SERVE_MODULES[modname]:
        assert flag in help_text, f"{modname} missing {flag}"


def test_reference_flag_vocabulary_preserved():
    """SURVEY.md §5 'recurring flag vocabulary' must exist on the main CLIs."""
    from facerecognitionpipeline_tpu.cli.face_matcher import build_parser as fm
    from facerecognitionpipeline_tpu.cli.enroll_students import build_parser as es

    fm_help = fm().format_help()
    for flag in ("--model_type", "--architecture", "--gallery_path",
                 "--threshold", "--aggregation", "--single_image", "--top_k"):
        assert flag in fm_help
    es_help = es().format_help()
    for flag in ("--enrollment_dir", "--gallery_path", "--min_faces",
                 "--max_faces", "--limit_images", "--image_indices"):
        assert flag in es_help


def test_cli_wrappers_import():
    for name in ("face_recognition_server", "face_recognition_client",
                 "face_recognition_live", "face_detection"):
        mod = importlib.import_module(f"facerecognitionpipeline_tpu.cli.{name}")
        assert callable(mod.main)
