"""Gallery sharding over the serving 'data' axis (engine shard_gallery=True).

The reference replicates its whole gallery in RAM per process
(`gallery_manager.py:177-205`); here the template matrix — the tensor that
grows with deployment size — row-shards over the same mesh axis the frame
batch shards over, and matching runs as an ICI query all-gather plus a
per-shard top-k candidate merge (`gallery.search.dp_sharded_cosine_topk`).
These tests pin numerical parity with the dense replicated path on the
virtual 8-device CPU mesh.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from facerecognitionpipeline_tpu.gallery.search import (
    DeviceGallery,
    cosine_topk,
    dp_sharded_cosine_topk,
)
from facerecognitionpipeline_tpu.models.detector import MTCNNDetector
from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder
from facerecognitionpipeline_tpu.pipeline.engine import RecognitionEngine


def _mesh(n=4):
    return Mesh(np.array(jax.devices()[:n]).reshape(n), axis_names=("data",))


def test_dp_sharded_topk_matches_dense(rng):
    mesh = _mesh(4)
    b, f, d, g, k = 8, 3, 64, 256, 4
    q = rng.normal(size=(b, f, d)).astype(np.float32)
    t = rng.normal(size=(g, d)).astype(np.float32)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    valid = np.ones(g, bool)
    valid[g - 7:] = False  # padded tail

    s_sh, i_sh = dp_sharded_cosine_topk(mesh, q, t, valid, k)
    s_dn, i_dn = cosine_topk(q.reshape(b * f, d), t, valid, k)
    np.testing.assert_allclose(
        np.asarray(s_sh).reshape(b * f, k), np.asarray(s_dn), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(i_sh).reshape(b * f, k), np.asarray(i_dn)
    )


def test_dp_sharded_topk_validates_shapes(rng):
    mesh = _mesh(4)
    q = rng.normal(size=(4, 2, 32)).astype(np.float32)
    t = rng.normal(size=(130, 32)).astype(np.float32)  # 130 % 4 != 0
    with pytest.raises(ValueError, match="must divide"):
        dp_sharded_cosine_topk(mesh, q, t, np.ones(130, bool), 2)
    t = rng.normal(size=(128, 32)).astype(np.float32)
    with pytest.raises(ValueError, match="must divide"):
        dp_sharded_cosine_topk(mesh, q[:3], t, np.ones(128, bool), 2)
    with pytest.raises(ValueError, match="top_k"):
        dp_sharded_cosine_topk(mesh, q, t, np.ones(128, bool), 33)


def test_device_gallery_sharded_placement_and_search(rng):
    mesh = _mesh(4)
    g = 300
    t = rng.normal(size=(g, 512)).astype(np.float32)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    ids = [f"id{i}" for i in range(g)]

    plain = DeviceGallery()
    plain.rebuild(ids, t)
    sharded = DeviceGallery(mesh=mesh)
    sharded.rebuild(ids, t)

    # padding rises to a multiple of n_dev * pad_multiple; rows shard on G
    assert sharded._templates.shape[0] % (4 * 128) == 0
    spec = sharded._templates.sharding.spec
    assert spec[0] == "data"

    q = rng.normal(size=(5, 512)).astype(np.float32)
    s_a, ids_a = plain.search(q, top_k=4)
    s_b, ids_b = sharded.search(q, top_k=4)
    np.testing.assert_allclose(s_a, s_b, atol=1e-5)
    assert ids_a == ids_b


def test_gallery_manager_mesh_passthrough(tmp_path, rng):
    from facerecognitionpipeline_tpu.gallery.manager import GalleryManager

    mesh = _mesh(2)
    gm = GalleryManager(
        gallery_path=str(tmp_path / "g.pkl"), verbose=False, mesh=mesh
    )
    emb = rng.normal(size=(3, 512)).astype(np.float32)
    gm.add_student("S1", "One", emb)
    templates, valid, ids = gm.device_snapshot()
    assert templates.sharding.spec[0] == "data"
    assert ids == ["S1"]


def test_engine_streaming_gallery_matches_dense(rng):
    """gallery_impl='streaming' (fused Pallas streaming kernel in-step)
    reproduces the dense-matmul match on all three topologies: single
    device, DP mesh (kernel per shard via shard_map, gallery replicated),
    and shard_gallery (kernel per gallery shard inside the candidate
    merge)."""
    detector = MTCNNDetector(det_size=(160, 160), max_faces=4, min_face_size=40)
    embedder = FaceEmbedder(architecture="ir_micro")
    mesh = _mesh(4)

    dg = DeviceGallery()
    t = rng.normal(size=(100, 512)).astype(np.float32)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    dg.rebuild([f"id{i}" for i in range(100)], t)  # pads to 128 rows
    frames = rng.integers(0, 256, size=(4, 160, 160, 3), dtype=np.uint8)

    dense = RecognitionEngine(detector, embedder, top_k=2)
    a = jax.device_get(
        dense.process_frames(frames, dg._templates, dg._valid, 2)
    )

    stream = RecognitionEngine(
        detector, embedder, top_k=2, gallery_impl="streaming",
        gallery_chunk=64,
    )
    b = jax.device_get(
        stream.process_frames(frames, dg._templates, dg._valid, 2)
    )
    np.testing.assert_allclose(a["match_scores"], b["match_scores"], atol=1e-5)
    np.testing.assert_array_equal(a["match_idx"], b["match_idx"])

    stream_dp = RecognitionEngine(
        detector, embedder, top_k=2, mesh=mesh, gallery_impl="streaming",
        gallery_chunk=64,
    )
    c = jax.device_get(
        stream_dp.process_frames(frames, dg._templates, dg._valid, 2)
    )
    # vs the SINGLE-DEVICE dense engine: mesh execution itself shifts the
    # embeddings by ~1e-4 (reduce-order), which the unit-norm dot passes
    # through — the match-impl equivalence is pinned exactly by a-vs-b above
    np.testing.assert_allclose(a["match_scores"], c["match_scores"], atol=1e-3)

    dg_sh = DeviceGallery(mesh=mesh)
    dg_sh.rebuild([f"id{i}" for i in range(100)], t)  # pads to 512 rows
    dg_ref = DeviceGallery(pad_multiple=dg_sh._templates.shape[0])
    dg_ref.rebuild([f"id{i}" for i in range(100)], t)
    a2 = jax.device_get(
        dense.process_frames(frames, dg_ref._templates, dg_ref._valid, 2)
    )
    stream_sharded = RecognitionEngine(
        detector, embedder, top_k=2, mesh=mesh, shard_gallery=True,
        gallery_impl="streaming", gallery_chunk=64,
    )
    d = jax.device_get(
        stream_sharded.process_frames(frames, dg_sh._templates, dg_sh._valid, 2)
    )
    np.testing.assert_allclose(
        a2["match_scores"], d["match_scores"], atol=1e-3
    )


def test_device_gallery_sharded_streaming_search(rng):
    """Mesh + streaming-scale DeviceGallery: per-shard Pallas streaming
    inside the candidate merge matches the plain dense gallery."""
    mesh = _mesh(4)
    g = 100
    t = rng.normal(size=(g, 512)).astype(np.float32)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    ids = [f"id{i}" for i in range(g)]

    plain = DeviceGallery()
    plain.rebuild(ids, t)
    sharded = DeviceGallery(mesh=mesh, streaming_threshold=8)
    sharded.STREAM_CHUNK = 32  # instance override keeps the test tiny
    sharded.rebuild(ids, t)
    assert sharded._templates_bf16 is not None  # streaming generation

    q = rng.normal(size=(5, 512)).astype(np.float32)
    s_a, ids_a = plain.search(q, top_k=4)
    s_b, ids_b = sharded.search(q, top_k=4)
    # bf16 template rounding shifts cosines by ~1e-3
    np.testing.assert_allclose(s_a, s_b, atol=5e-3)
    assert ids_a == ids_b


def test_server_requires_mesh_for_shard_gallery(tmp_path):
    from facerecognitionpipeline_tpu.serve.server import FaceRecognitionServer

    with pytest.raises(ValueError, match="shard_gallery"):
        FaceRecognitionServer(
            gallery_path=str(tmp_path / "g.pkl"),
            output_dir=str(tmp_path),
            shard_gallery=True,
        )


def test_engine_requires_mesh_for_shard_gallery():
    detector = MTCNNDetector(det_size=(160, 160), max_faces=4, min_face_size=40)
    embedder = FaceEmbedder(architecture="ir_micro")
    with pytest.raises(ValueError, match="shard_gallery"):
        RecognitionEngine(detector, embedder, shard_gallery=True)


def test_engine_shard_gallery_matches_single_device(rng):
    """Dense AND budget paths: the gallery-sharded fused step reproduces the
    replicated single-device step bit-for-bit (up to f32 reduce order)."""
    detector = MTCNNDetector(det_size=(160, 160), max_faces=4, min_face_size=40)
    embedder = FaceEmbedder(architecture="ir_micro")
    mesh = _mesh(4)

    dg = DeviceGallery(mesh=mesh)
    t = rng.normal(size=(6, 512)).astype(np.float32)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    dg.rebuild([f"id{i}" for i in range(6)], t)
    # unsharded reference gallery with the same padded shape
    dg_plain = DeviceGallery(pad_multiple=dg._templates.shape[0])
    dg_plain.rebuild([f"id{i}" for i in range(6)], t)

    frames = rng.integers(0, 256, size=(4, 160, 160, 3), dtype=np.uint8)

    single = RecognitionEngine(detector, embedder, top_k=2)
    sharded = RecognitionEngine(
        detector, embedder, top_k=2, mesh=mesh, shard_gallery=True
    )
    a = jax.device_get(
        single.process_frames(frames, dg_plain._templates, dg_plain._valid, 2)
    )
    b = jax.device_get(
        sharded.process_frames(frames, dg._templates, dg._valid, 2)
    )
    np.testing.assert_allclose(a["match_scores"], b["match_scores"], atol=1e-4)
    np.testing.assert_array_equal(a["face_valid"], b["face_valid"])
    np.testing.assert_allclose(a["embeddings"], b["embeddings"], atol=1e-4)

    single_b = RecognitionEngine(
        detector, embedder, top_k=2, embed_budget=2
    )
    sharded_b = RecognitionEngine(
        detector, embedder, top_k=2, mesh=mesh, shard_gallery=True,
        embed_budget=2,
    )
    a = jax.device_get(
        single_b.process_frames(
            frames, dg_plain._templates, dg_plain._valid, 2, rotation=1
        )
    )
    b = jax.device_get(
        sharded_b.process_frames(frames, dg._templates, dg._valid, 2,
                                 rotation=1)
    )
    np.testing.assert_allclose(a["match_scores"], b["match_scores"], atol=1e-4)
    np.testing.assert_array_equal(a["embedded"], b["embedded"])
