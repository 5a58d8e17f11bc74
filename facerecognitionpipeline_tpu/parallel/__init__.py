"""Multi-chip parallelism helpers (mesh construction, DP embed, sharded search).

The reference's only distribution axis is an HTTP client/server split
(SURVEY.md §2 'Parallelism' table). Device-side scaling here:

* DP: batch-sharded embedding forward (`data_parallel_embed`)
* gallery sharding: `gallery.search.sharded_cosine_topk` (G axis over ICI,
  replicated queries) and `dp_sharded_cosine_topk` (G and the query batch
  over the SAME 'data' axis — the serving composition behind the engine's
  `shard_gallery=True`)
* training: DP x class-sharded partial-FC TP (`train/trainer.py`)
* PP/SP/EP: N/A for 112x112 CNNs (no sequence axis) — documented, not stubbed.
"""

from facerecognitionpipeline_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_parallel_embed,
)
from facerecognitionpipeline_tpu.gallery.search import (  # noqa: F401
    dp_sharded_cosine_topk,
    sharded_cosine_topk,
)
