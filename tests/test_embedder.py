"""FaceEmbedder API tests (random-init weights; parity covered in test_irse)."""

import numpy as np
import pytest

from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder


@pytest.fixture(scope="module")
def embedder():
    return FaceEmbedder(architecture="ir_18", model_type="adaface")


def test_single_embedding(embedder, rng):
    face = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
    emb = embedder.extract_embedding(face)
    assert emb.shape == (512,)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-5)


def test_batch_embedding_consistent_with_single(embedder, rng):
    faces = [rng.integers(0, 255, (112, 112, 3), dtype=np.uint8) for _ in range(5)]
    batch = embedder.extract_embeddings_batch(faces)
    assert batch.shape == (5, 512)
    single = embedder.extract_embedding(faces[2])
    np.testing.assert_allclose(batch[2], single, atol=1e-5)


def test_batch_empty(embedder):
    out = embedder.extract_embeddings_batch([])
    # contract is [N, 512]; the empty case must keep the column shape so
    # callers can concatenate / column-index without a special case
    assert out.shape == (0, 512) and out.dtype == np.float32


def test_batch_4d_array_input(embedder, rng):
    faces = rng.integers(0, 255, (3, 112, 112, 3), dtype=np.uint8)
    batch = embedder.extract_embeddings_batch(faces)
    assert batch.shape == (3, 512)


def test_similarity_and_aggregation(embedder, rng):
    embs = rng.normal(size=(4, 512)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)

    sim = embedder.compute_similarity(embs[0], embs[0])
    assert sim == pytest.approx(1.0, abs=1e-4)

    sims = embedder.compute_similarity_batch(embs[0], embs)
    assert sims.shape == (4,)
    assert sims[0] == pytest.approx(1.0, abs=1e-4)

    for method in ("mean", "median", "weighted_mean"):
        agg = embedder.aggregate_embeddings(embs, method=method)
        assert agg.shape == (512,)
        np.testing.assert_allclose(np.linalg.norm(agg), 1.0, atol=1e-4)

    with pytest.raises(ValueError):
        embedder.aggregate_embeddings(embs, method="nope")
    with pytest.raises(ValueError):
        embedder.aggregate_embeddings(np.zeros((0, 512)))
    # single embedding passes through
    np.testing.assert_array_equal(embedder.aggregate_embeddings(embs[:1]), embs[0])


def test_embedding_distinguishes_inputs(embedder, rng):
    a = rng.integers(0, 255, (112, 112, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (112, 112, 3), dtype=np.uint8)
    ea, eb = embedder.extract_embeddings_batch([a, b])
    assert abs(float(np.dot(ea, eb))) < 0.999


def test_missing_weights_raises():
    with pytest.raises(FileNotFoundError):
        FaceEmbedder(architecture="ir_18", model_path="/nonexistent/w.ckpt")


def test_random_ok_silences_missing_weights_warning(capfd):
    """random_ok=True is the deliberate-random-init contract (bench.py,
    __graft_entry__.py): no stderr warning; the default still warns so
    accidental production use without a checkpoint stays loud."""
    FaceEmbedder(architecture="ir_micro", random_ok=True)
    assert "[FaceEmbedder]" not in capfd.readouterr().err
    FaceEmbedder(architecture="ir_micro")
    err = capfd.readouterr().err
    assert "No pretrained weights" in err and "ir_micro" in err
