"""Worker recycling (--max_requests) and the legacy /process_faces route.

VERDICT r3 #6: the image's device-tunnel client retains ~0.6 MB/request
(bisected in PERFORMANCE.md, regression-gated by tests/test_serving_leak.py)
— the operational answer is bounded-lifetime workers: after N frame requests
the worker drains in-flight requests, persists session state, and exits with
RECYCLE_EXIT_CODE for the supervisor (`serve.server._supervise`) to respawn;
the fresh worker resumes the active session from disk.

VERDICT r3 #8: the reference's client-side-detection contract
(`face_recognition_server.py:349-444`, route disabled at :846-866) is
re-exposed behind --legacy_faces_route.
"""

import json
import os
import threading
import time

import numpy as np
import pytest
import requests

from facerecognitionpipeline_tpu.gallery.manager import GalleryManager
from facerecognitionpipeline_tpu.serve.client import _encode_image_base64
from facerecognitionpipeline_tpu.serve.server import (
    RECYCLE_EXIT_CODE,
    FaceRecognitionServer,
    serve,
)
from tests.test_server import FakeEngine


class FakeEmbedder:
    """Maps every crop to student 0's aggregated gallery template."""

    def __init__(self, gallery: GalleryManager):
        rec = gallery.students["STU0000"]
        self._emb = np.asarray(rec.template_embedding, np.float32)

    def extract_embeddings_batch(self, crops):
        return np.stack([self._emb for _ in crops])


def _make_gallery(tmp_path, rng):
    gallery = GalleryManager(gallery_path=str(tmp_path / "g.pkl"),
                             verbose=False)
    for i in range(3):
        emb = rng.normal(size=(2, 512)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        gallery.add_student(f"STU{i:04d}", f"Student {i}", emb)
    return gallery


def _serve(srv):
    httpd = serve(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd, thread, f"http://127.0.0.1:{port}"


# ------------------------------------------------------------- recycling


def test_max_requests_drains_then_resumes(tmp_path, rng):
    gallery = _make_gallery(tmp_path, rng)
    out_dir = str(tmp_path / "sessions")
    srv = FaceRecognitionServer(
        gallery=gallery, output_dir=out_dir, engine=FakeEngine(gallery),
        batch_max=4, batch_wait_ms=2.0, max_requests=2,
    )
    httpd, thread, url = _serve(srv)
    try:
        requests.post(f"{url}/init_session",
                      json={"session_name": "shift"}, timeout=10)
        frame = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
        for i in range(2):
            r = requests.post(
                f"{url}/process_frame",
                json={"frame": _encode_image_base64(frame), "frame_count": i},
                timeout=30,
            )
            # the limit-triggering request still completes normally
            assert r.status_code == 200
        # note_request_served fires after the 2nd response: serve_forever
        # must return on its own (no external shutdown call)
        thread.join(timeout=10)
        assert not thread.is_alive()
        assert srv._recycle_requested
        assert RECYCLE_EXIT_CODE == 75
    finally:
        if thread.is_alive():  # pragma: no cover - failure path cleanup
            httpd.shutdown()
        httpd.server_close()
        srv.shutdown()

    # supervisor handoff state
    with open(os.path.join(out_dir, ".recycle_state.json")) as f:
        assert json.load(f)["session_name"] == "shift"
    # counters flushed while the session stays active
    with open(os.path.join(out_dir, "shift", "session.json")) as f:
        sess = json.load(f)
    assert sess["status"] == "active"
    assert sess["statistics"]["total_frames_processed"] >= 1
    with open(os.path.join(out_dir, "shift", "attendance.json")) as f:
        att_before = json.load(f)
    assert len(att_before["recognized"]) == 1  # FakeEngine saw student 0

    # ---- respawned worker resumes the session from disk
    srv2 = FaceRecognitionServer(
        gallery=gallery, output_dir=out_dir, engine=FakeEngine(gallery),
        batch_max=4, batch_wait_ms=2.0, max_requests=2,
    )
    try:
        srv2._create_session("shift", resume=True)
        assert srv2.frame_count == sess["statistics"]["total_frames_processed"]
        assert (srv2.total_faces_detected
                == sess["statistics"]["total_faces_detected"])
        # resume did NOT reset the attendance file
        with open(os.path.join(out_dir, "shift", "attendance.json")) as f:
            assert json.load(f) == att_before
    finally:
        srv2.shutdown()


def test_resume_ignores_completed_session(tmp_path, rng):
    """A finalized session never resumes — the recycled worker starts it
    fresh (matching /init_session semantics for a finished session)."""
    gallery = _make_gallery(tmp_path, rng)
    out_dir = str(tmp_path / "sessions")
    srv = FaceRecognitionServer(
        gallery=gallery, output_dir=out_dir, engine=FakeEngine(gallery),
        batch_max=4, batch_wait_ms=2.0,
    )
    try:
        srv._create_session("done")
        path = os.path.join(out_dir, "done", "session.json")
        with open(path) as f:
            data = json.load(f)
        data["status"] = "completed"
        data.setdefault("statistics", {})["total_frames_processed"] = 99
        with open(path, "w") as f:
            json.dump(data, f)
        srv._create_session("done", resume=True)
        assert srv.frame_count == 0  # fresh, not resumed
    finally:
        srv.shutdown()


def test_max_requests_validation():
    from facerecognitionpipeline_tpu.serve.server import main

    with pytest.raises(SystemExit):
        main(["--gallery_path", "/nonexistent", "--max_requests", "0"])


def test_supervisor_respawns_with_resume(tmp_path, monkeypatch):
    """_supervise respawns on RECYCLE_EXIT_CODE, passing the persisted
    session to the next worker, and returns the first non-recycle code."""
    import subprocess

    from facerecognitionpipeline_tpu.serve import server as srv_mod

    out_dir = str(tmp_path)
    calls = []
    codes = iter([srv_mod.RECYCLE_EXIT_CODE, srv_mod.RECYCLE_EXIT_CODE, 0])

    class FakeProc:
        def __init__(self, rc):
            self._rc = rc

        def wait(self):
            return self._rc

        def poll(self):
            return self._rc

        def terminate(self):  # pragma: no cover - signal path
            pass

    def fake_popen(cmd):
        calls.append(cmd)
        # worker persists handoff state before exiting with the recycle code
        with open(os.path.join(out_dir, ".recycle_state.json"), "w") as f:
            json.dump({"session_name": f"sess{len(calls)}"}, f)
        return FakeProc(next(codes))

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    args = srv_mod.build_parser().parse_args(
        ["--output_dir", out_dir, "--max_requests", "5"]
    )
    rc = srv_mod._supervise(["--output_dir", out_dir, "--max_requests", "5"],
                            args)
    assert rc == 0
    assert len(calls) == 3
    assert "--_worker" in calls[0] and "--_resume_session" not in calls[0]
    # generation 2 resumes the session generation 1 persisted, and so on
    assert calls[1][calls[1].index("--_resume_session") + 1] == "sess1"
    assert calls[2][calls[2].index("--_resume_session") + 1] == "sess2"


# ------------------------------------------------------- legacy route


def _legacy_server(tmp_path, rng, enabled: bool):
    gallery = _make_gallery(tmp_path, rng)
    engine = FakeEngine(gallery)
    engine.embedder = FakeEmbedder(gallery)
    srv = FaceRecognitionServer(
        gallery=gallery, output_dir=str(tmp_path / "sessions"),
        engine=engine, batch_max=4, batch_wait_ms=2.0,
        legacy_faces_route=enabled, max_recognition_attempts=2,
    )
    return srv


def test_legacy_faces_route_disabled_by_default(tmp_path, rng):
    srv = _legacy_server(tmp_path, rng, enabled=False)
    httpd, thread, url = _serve(srv)
    try:
        requests.post(f"{url}/init_session",
                      json={"session_name": "t"}, timeout=10)
        r = requests.post(f"{url}/process_faces",
                          json={"faces": [], "frame_count": 0}, timeout=10)
        assert r.status_code == 404
        assert "legacy" in r.json()["error"]
    finally:
        httpd.shutdown()
        httpd.server_close()
        srv.shutdown()


def test_legacy_faces_route_recognizes(tmp_path, rng):
    srv = _legacy_server(tmp_path, rng, enabled=True)
    httpd, thread, url = _serve(srv)
    try:
        # session gate first
        r = requests.post(f"{url}/process_faces",
                          json={"faces": [], "frame_count": 0}, timeout=10)
        assert r.status_code == 400

        requests.post(f"{url}/init_session",
                      json={"session_name": "legacy"}, timeout=10)
        crop = rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
        payload = {
            "faces": [{
                "track_id": 7,
                "aligned_face_base64": _encode_image_base64(crop),
                "det_score": 0.95,
                "blur_score": 250.0,
            }],
            "frame_count": 1,
            "timestamp": "2026-08-20T10:00:00",
        }
        r = requests.post(f"{url}/process_faces", json=payload, timeout=30)
        assert r.status_code == 200
        body = r.json()
        # reference response schema (face_recognition_server.py:433-444)
        for key in ("frame_count", "faces_processed", "recognition_events",
                    "recognized_tracks", "recognition_attempts",
                    "failed_tracks", "tracks_in_cooldown", "performance"):
            assert key in body, key
        assert body["faces_processed"] == 1
        assert body["recognition_events"] == 1
        rec = body["recognized_tracks"]["7"]
        assert rec["student_id"] == "STU0000"
        assert rec["recognized"] is True
        assert rec["confidence"] == pytest.approx(1.0, abs=1e-3)
        # no host file paths or _-prefixed bookkeeping in the wire schema
        assert not any(k.startswith("_") for k in rec), rec.keys()
        assert "saved_face_path" not in rec

        # attendance + face crop artifacts on disk
        sdir = os.path.join(str(tmp_path / "sessions"), "legacy")
        with open(os.path.join(sdir, "attendance.json")) as f:
            att = json.load(f)
        assert att["recognized"][0]["student_id"] == "STU0000"
        rec_dir = os.path.join(sdir, "recognized_faces", "STU0000_Student_0")
        assert any(f.endswith("_aligned.png") for f in os.listdir(rec_dir))

        # an already-recognized track does not re-fire
        r = requests.post(f"{url}/process_faces", json=payload, timeout=30)
        assert r.json()["recognition_events"] == 0
    finally:
        httpd.shutdown()
        httpd.server_close()
        srv.shutdown()


def test_legacy_faces_route_unknown_face(tmp_path, rng):
    """A crop matching nobody exhausts attempts into failed_tracks."""
    srv = _legacy_server(tmp_path, rng, enabled=True)
    # embedder that matches no template
    anti = rng.normal(size=512).astype(np.float32)
    anti /= np.linalg.norm(anti)
    srv.engine.embedder.extract_embeddings_batch = (
        lambda crops: np.stack([anti for _ in crops])
    )
    httpd, thread, url = _serve(srv)
    try:
        requests.post(f"{url}/init_session",
                      json={"session_name": "unk"}, timeout=10)
        crop = rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
        payload = {
            "faces": [{"track_id": 3,
                       "aligned_face_base64": _encode_image_base64(crop),
                       "det_score": 0.9, "blur_score": 300.0}],
            "frame_count": 1,
        }
        body = None
        for i in range(3):
            r = requests.post(f"{url}/process_faces", json=payload, timeout=30)
            body = r.json()
            time.sleep(0.01)
        # max_recognition_attempts=2 exhausted -> failed, cooling down
        # (after retry_cooldown the tracker resets attempts and retries —
        # reference cooldown semantics, face_recognition_server.py:109-120)
        assert body["recognized_tracks"] == {}
        assert "3" in body["failed_tracks"]
        assert "3" in body["tracks_in_cooldown"]
    finally:
        httpd.shutdown()
        httpd.server_close()
        srv.shutdown()


def test_resumed_worker_does_not_reinit_session_name(tmp_path, rng, monkeypatch):
    """--session_name + --_resume_session: the constructor must NOT
    initialize --session_name (that would wipe session.json/attendance.json
    moments before the resume reads them); resume wins."""
    from facerecognitionpipeline_tpu.serve import server as srv_mod

    calls = {}

    class FakeServer:
        _recycle_requested = False

        def __init__(self, **kw):
            calls["ctor_session_name"] = kw.get("session_name", "MISSING")

        def _create_session(self, name, resume=False):
            calls["resume"] = (name, resume)

        def shutdown(self):
            pass

    class FakeHTTPD:
        def serve_forever(self):
            raise KeyboardInterrupt  # exit main() immediately

        def server_close(self):
            pass

    monkeypatch.setattr(srv_mod, "FaceRecognitionServer", FakeServer)
    monkeypatch.setattr(srv_mod, "serve", lambda s, h, p: FakeHTTPD())
    rc = srv_mod.main([
        "--gallery_path", str(tmp_path / "g.pkl"),
        "--output_dir", str(tmp_path),
        "--session_name", "shift",
        "--max_requests", "5", "--_worker",
        "--_resume_session", "shift",
    ])
    assert rc == 0
    assert calls["ctor_session_name"] is None  # NOT re-initialized
    assert calls["resume"] == ("shift", True)

    # without a resume target, --session_name initializes normally
    calls.clear()
    srv_mod.main([
        "--gallery_path", str(tmp_path / "g.pkl"),
        "--output_dir", str(tmp_path),
        "--session_name", "shift",
        "--max_requests", "5", "--_worker",
    ])
    assert calls["ctor_session_name"] == "shift"
    assert "resume" not in calls
