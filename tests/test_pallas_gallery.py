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
