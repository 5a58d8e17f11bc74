"""High-level pipeline: embedder, detect→align→filter processor, matcher."""

from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder  # noqa: F401
