"""Mesh construction and data-parallel inference helpers."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None, model: int = 1, devices=None
) -> Mesh:
    """('data', 'model') mesh over the available devices.

    data=None uses every device not consumed by the model axis.
    """
    devices = np.array(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    use = data * model
    if use < 1 or use > len(devices):
        raise ValueError(
            f"mesh data={data} x model={model} needs {max(use, model)} "
            f"devices, have {len(devices)}"
        )
    return Mesh(devices[:use].reshape(data, model), axis_names=("data", "model"))


def data_parallel_embed(embedder, mesh: Mesh):
    """Batch-sharded embedding forward: params replicated, faces split on the
    'data' axis, features gathered back. Returns fn(faces_rgb [B,H,W,3]) ->
    (features [B,512], norms [B,1]); B must be a MULTIPLE of the 'data' axis size."""
    batch_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    @jax.jit
    def fn(variables, faces_rgb):
        faces_rgb = jax.lax.with_sharding_constraint(faces_rgb, batch_sharding)
        feats, norms = embedder._forward_impl(variables, faces_rgb)
        return (
            jax.lax.with_sharding_constraint(feats, replicated),
            jax.lax.with_sharding_constraint(norms, replicated),
        )

    def embed(faces_rgb):
        return fn(embedder.variables, jnp.asarray(faces_rgb))

    return embed
