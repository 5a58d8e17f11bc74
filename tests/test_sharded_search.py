"""Multi-device gallery-sharded search on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from facerecognitionpipeline_tpu.gallery.search import (
    cosine_topk,
    sharded_cosine_topk,
)


@pytest.fixture(scope="module")
def mesh():
    devices = np.array(jax.devices())
    assert len(devices) >= 8, "conftest should provide 8 virtual CPU devices"
    return Mesh(devices[:8], axis_names=("gallery",))


def test_sharded_matches_single_device(mesh, rng):
    g, q, k = 1024, 16, 5
    templates = rng.normal(size=(g, 512)).astype(np.float32)
    templates /= np.linalg.norm(templates, axis=1, keepdims=True)
    valid = np.ones(g, bool)
    valid[-37:] = False  # padded tail
    queries = templates[rng.integers(0, g - 37, size=q)]

    ref_s, ref_i = cosine_topk(queries, templates, valid, k)
    sh_s, sh_i = sharded_cosine_topk(mesh, queries, templates, valid, k)

    np.testing.assert_allclose(np.asarray(sh_s), np.asarray(ref_s), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(sh_i), np.asarray(ref_i))
    # self-queries find themselves at rank 1
    assert np.allclose(np.asarray(sh_s)[:, 0], 1.0, atol=1e-5)
