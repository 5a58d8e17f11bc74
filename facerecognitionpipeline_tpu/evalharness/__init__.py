"""Evaluation harness: identification, verification, impostor and segmented
metrics with batched device scoring; comparison/statistics/exports."""

from facerecognitionpipeline_tpu.evalharness.metrics import (  # noqa: F401
    identity_scores_batch,
    compute_rank_metrics_batch,
    compute_dprime,
    bootstrap_confidence_interval,
)
from facerecognitionpipeline_tpu.evalharness.identification import (  # noqa: F401
    evaluate_probes_comprehensive,
    evaluate_impostors_comprehensive,
    evaluate_segmented_comprehensive,
)
from facerecognitionpipeline_tpu.evalharness.verification import (  # noqa: F401
    evaluate_verification_comprehensive,
)
