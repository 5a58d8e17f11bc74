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
