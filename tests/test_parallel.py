"""Data-parallel embed on the virtual mesh matches single-device output."""

import numpy as np
import pytest

from facerecognitionpipeline_tpu.parallel.mesh import data_parallel_embed, make_mesh
from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder


def test_make_mesh_shapes():
    mesh = make_mesh(model=2)
    assert mesh.shape["model"] == 2
    assert mesh.shape["data"] * 2 <= 8
    mesh2 = make_mesh(data=4, model=1)
    assert dict(mesh2.shape) == {"data": 4, "model": 1}


def test_data_parallel_embed_matches_single(rng):
    embedder = FaceEmbedder(architecture="ir_micro")
    mesh = make_mesh(data=4, model=1)
    embed = data_parallel_embed(embedder, mesh)

    faces = rng.integers(0, 256, size=(8, 112, 112, 3), dtype=np.uint8)
    feats, norms = embed(faces)
    assert feats.shape == (8, 512)

    single = embedder.extract_embeddings_batch(faces)
    np.testing.assert_allclose(np.asarray(feats), single, atol=1e-4)


def test_make_mesh_rejects_oversized_axes():
    from facerecognitionpipeline_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="devices"):
        make_mesh(model=64)  # 8-device test env


def test_batcher_rejects_unshardable_max_batch():
    """DeviceBatcher under a mesh must fail fast when max_batch can't split
    over the 'data' axis (previously produced an unshardable fallback
    bucket that failed deep in warmup)."""
    from facerecognitionpipeline_tpu.parallel.mesh import make_mesh
    from facerecognitionpipeline_tpu.serve.batcher import DeviceBatcher

    class _Engine:
        mesh = make_mesh(data=4, model=1)

    with pytest.raises(ValueError, match="multiple"):
        DeviceBatcher(_Engine(), lambda: (None, None), max_batch=6)
