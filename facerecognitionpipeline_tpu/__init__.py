"""TPU-native face-recognition framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
classroom-attendance pipeline (tuoasty/FaceRecognitionPipeline): detection with
5-point landmarks, similarity-transform alignment, IR/IR-SE (ir_50/ir_101)
AdaFace/ArcFace embedding, an HBM-resident cosine-similarity gallery with
on-device top-k matching, enrollment / preprocessing / labeling / evaluation
tooling, and a batched multi-client streaming recognition server with
client/server telemetry.

Unlike the reference's per-face Python loops over CUDA/ONNX, every compute
stage here is a fixed-shape, masked, jitted batch on TPU.
"""

__version__ = "0.1.0"

_LAZY = {
    "FaceEmbedder": "facerecognitionpipeline_tpu.pipeline.embedder",
    "FaceProcessor": "facerecognitionpipeline_tpu.pipeline.processor",
    "GalleryManager": "facerecognitionpipeline_tpu.gallery.manager",
    "StudentRecord": "facerecognitionpipeline_tpu.gallery.manager",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module = importlib.import_module(_LAZY[name])
        return getattr(module, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
