"""Model zoo: IR/IR-SE embedding backbones, detector cascade, margin heads."""

from facerecognitionpipeline_tpu.models.irse import (  # noqa: F401
    IRBackbone,
    build_backbone,
    BACKBONE_CONFIGS,
)
