"""Training checkpoint/resume (orbax) + deployable backbone export.

The reference has no training and no mid-run resume (SURVEY.md §5
"Checkpoint/resume": model checkpoints are read-only inputs; app state is the
gallery pickle). A complete framework must produce and resume checkpoints:

* `save_checkpoint` / `restore_checkpoint` — full training state (params,
  BN stats, optimizer state, norm EMA, step) via orbax, step-numbered with
  retention;
* `export_backbone` — strips training state down to the inference variables
  and writes the framework's .npz weight format, which `FaceEmbedder`
  loads directly (the train->deploy loop).
"""

from __future__ import annotations

import os
from typing import Optional

# Canonical npz (de)serialization lives in utils.io; load_npz_variables is
# re-exported here because embedder/tests import it from this module.
from facerecognitionpipeline_tpu.utils.io import load_npz_variables  # noqa: F401

import jax
import numpy as np


def _manager(checkpoint_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(checkpoint_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_checkpoint(checkpoint_dir: str, state, step: int) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(checkpoint_dir)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(checkpoint_dir: str) -> Optional[int]:
    if not os.path.isdir(checkpoint_dir):
        return None
    mgr = _manager(checkpoint_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(checkpoint_dir: str, abstract_state, step: Optional[int] = None):
    """Restore into the sharding/structure of `abstract_state` (e.g. a fresh
    `Trainer.init_state()`)."""
    import orbax.checkpoint as ocp

    mgr = _manager(checkpoint_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"No checkpoints under {checkpoint_dir}")
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(abstract_state)
    )
    mgr.close()
    return restored


def export_backbone(state, path: str) -> None:
    """Write inference variables ({'params', 'batch_stats'}) as the flattened
    .npz format `FaceEmbedder(model_path=...)` and `MTCNNDetector` use."""
    from facerecognitionpipeline_tpu.utils.io import save_npz_variables

    save_npz_variables(path, {
        "params": jax.device_get(state["params"]["backbone"]),
        "batch_stats": jax.device_get(state["batch_stats"]),
    })



