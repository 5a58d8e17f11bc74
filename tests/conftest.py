"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The driver benches on the single real TPU chip; tests exercise sharding and
numerics on 8 virtual CPU devices so multi-chip `Mesh`/`shard_map` code paths
compile and run without hardware. In this image a sitecustomize registers an
`axon` TPU backend and pins JAX_PLATFORMS=axon, and combining
JAX_PLATFORMS=cpu with --xla_force_host_platform_device_count stalls the
remote-compile tunnel — so we neutralize the env var and use jax.config
(jax_platforms + jax_num_cpu_devices) instead, before any test imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = ""
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
