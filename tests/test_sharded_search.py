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


def test_sharded_int8_templates_match_decisions(mesh, rng):
    """(int8 codes, row scales) templates shard over the mesh like plain
    rows — per-shard scoring runs the int8 path, the ICI candidate merge is
    unchanged, and top-1 decisions match the dense f32 reference."""
    from facerecognitionpipeline_tpu.ops.pallas_gallery import (
        quantize_templates,
    )

    g, q, k = 1024, 16, 5
    templates = rng.normal(size=(g, 512)).astype(np.float32)
    templates /= np.linalg.norm(templates, axis=1, keepdims=True)
    valid = np.ones(g, bool)
    valid[-37:] = False
    templates[-37:] = 0
    queries = templates[rng.integers(0, g - 37, size=q)]

    ref_s, ref_i = cosine_topk(queries, templates, valid, k)
    tq, sc = quantize_templates(templates)
    sh_s, sh_i = sharded_cosine_topk(
        mesh, queries, (tq, sc), valid, k, streaming=False
    )
    np.testing.assert_array_equal(
        np.asarray(sh_i)[:, 0], np.asarray(ref_i)[:, 0]
    )
    np.testing.assert_allclose(np.asarray(sh_s), np.asarray(ref_s), atol=3e-3)


def test_dp_sharded_int8_templates(mesh, rng):
    """DP×row-sharded matching (the fused engine's shard_gallery path)
    accepts int8 template pairs."""
    from facerecognitionpipeline_tpu.gallery.search import (
        dp_sharded_cosine_topk,
    )
    from facerecognitionpipeline_tpu.ops.pallas_gallery import (
        quantize_templates,
    )

    g, b, f, k = 1024, 8, 2, 3
    templates = rng.normal(size=(g, 512)).astype(np.float32)
    templates /= np.linalg.norm(templates, axis=1, keepdims=True)
    valid = np.ones(g, bool)
    feats = templates[rng.integers(0, g, size=b * f)].reshape(b, f, 512)

    ref_s, ref_i = cosine_topk(feats.reshape(-1, 512), templates, valid, k)
    tq, sc = quantize_templates(templates)
    s, i = dp_sharded_cosine_topk(
        mesh, feats, (tq, sc), valid, k, axis="gallery"
    )
    np.testing.assert_array_equal(
        np.asarray(i).reshape(-1, k)[:, 0], np.asarray(ref_i)[:, 0]
    )
    np.testing.assert_allclose(
        np.asarray(s).reshape(-1, k), np.asarray(ref_s), atol=3e-3
    )
