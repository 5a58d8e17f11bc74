"""Training: margin-softmax heads (AdaFace/ArcFace/CosFace) and the sharded
train step (data-parallel batch x class-sharded partial-FC classifier)."""

from facerecognitionpipeline_tpu.train.losses import (  # noqa: F401
    adaface_margin_cosine,
    arcface_margin_cosine,
    cosface_margin_cosine,
)
from facerecognitionpipeline_tpu.train.trainer import (  # noqa: F401
    TrainConfig,
    Trainer,
)
