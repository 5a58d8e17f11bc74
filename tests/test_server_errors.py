"""Server robustness: malformed inputs produce clean JSON errors, not hangs."""

import threading

import numpy as np
import pytest
import requests

from facerecognitionpipeline_tpu.gallery.manager import GalleryManager
from facerecognitionpipeline_tpu.serve.server import FaceRecognitionServer, serve
from tests.test_server import FakeEngine


@pytest.fixture
def server(tmp_path, rng):
    gallery = GalleryManager(gallery_path=str(tmp_path / "g.pkl"), verbose=False)
    emb = rng.normal(size=(1, 512)).astype(np.float32)
    gallery.add_student("S1", "One", emb / np.linalg.norm(emb))
    srv = FaceRecognitionServer(
        gallery=gallery, output_dir=str(tmp_path / "sessions"),
        engine=FakeEngine(gallery),
    )
    httpd = serve(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()
    srv.shutdown()


def test_unknown_route(server):
    assert requests.get(f"{server}/nope", timeout=5).status_code == 404
    assert requests.post(f"{server}/nope", json={}, timeout=5).status_code == 404


def test_init_session_requires_name(server):
    r = requests.post(f"{server}/init_session", json={}, timeout=5)
    assert r.status_code == 400
    assert "session_name" in r.json()["error"]


def test_process_frame_bad_payloads(server):
    requests.post(f"{server}/init_session", json={"session_name": "e"}, timeout=5)
    # not base64 / not an image
    r = requests.post(f"{server}/process_frame", json={"frame": "!!!"}, timeout=10)
    assert r.status_code == 400
    assert "decode" in r.json()["error"]
    # missing frame field entirely
    r = requests.post(f"{server}/process_frame", json={}, timeout=10)
    assert r.status_code == 400
    # empty body
    r = requests.post(f"{server}/process_frame", data=b"", timeout=10)
    assert r.status_code in (400, 500)


def test_stats_endpoint(server):
    requests.post(f"{server}/init_session", json={"session_name": "s"}, timeout=5)
    r = requests.get(f"{server}/stats", timeout=5)
    assert r.status_code == 200
    assert "total_requests" in r.json()
