"""Security/consistency hardening tests (ADVICE round 1).

- /init_session and /save_snapshot must reject path-traversal components
  (the reference shipped this hole at face_recognition_server.py:232/530).
- Match-index -> student-id resolution must use the gallery snapshot taken
  at batch dispatch, not a post-hoc ``id_at`` against a mutated gallery.
"""

import numpy as np
import pytest
import requests

from facerecognitionpipeline_tpu.gallery.manager import GalleryManager
from facerecognitionpipeline_tpu.serve.client import _encode_image_base64
from facerecognitionpipeline_tpu.serve.server import _safe_path_component

from tests.test_server import server  # noqa: F401  (fixture reuse)


def test_safe_path_component():
    assert _safe_path_component("class_2026-08.v2", "x") == "class_2026-08.v2"
    for bad in ("../evil", "a/../b", "/abs", "a/b", "", ".hidden", "..", "a b",
                "a\x00b", "..evil"):
        with pytest.raises(ValueError):
            _safe_path_component(bad, "x")


def test_http_rejects_traversal(server, rng):  # noqa: F811
    srv, url, tmp_path = server
    r = requests.post(f"{url}/init_session",
                      json={"session_name": "../evil"}, timeout=10)
    assert r.status_code == 400
    assert not (tmp_path / "evil").exists()
    assert srv.session_name is None  # session state untouched

    r = requests.post(f"{url}/init_session",
                      json={"session_name": "ok_session"}, timeout=10)
    assert r.status_code == 200

    frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    r = requests.post(
        f"{url}/save_snapshot",
        json={"snapshot": _encode_image_base64(frame), "frame_count": 1,
              "timestamp": "../../escape"},
        timeout=10,
    )
    assert r.status_code == 400
    assert not (tmp_path / "escape.png").exists()


def test_device_snapshot_is_mutation_stable(tmp_path, rng):
    gallery = GalleryManager(gallery_path=str(tmp_path / "g.pkl"), verbose=False)
    for i in range(3):
        emb = rng.normal(size=(2, 512)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        gallery.add_student(f"STU{i:04d}", f"Student {i}", emb)

    templates, valid, ids = gallery.device_snapshot()
    assert ids[:3] == ["STU0000", "STU0001", "STU0002"]

    # Mutate the gallery: indices shift, but the dispatched snapshot must not.
    gallery.delete_student("STU0000")
    assert gallery.id_at(0) != "STU0000"  # live view shifted
    assert ids[0] == "STU0000"            # snapshot stable
    # and a fresh snapshot reflects the mutation
    _, _, ids2 = gallery.device_snapshot()
    assert "STU0000" not in ids2
