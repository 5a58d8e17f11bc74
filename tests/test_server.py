"""Streaming server end-to-end over real HTTP with a deterministic engine."""

import json
import os
import threading
import time

import numpy as np
import pytest
import requests

from facerecognitionpipeline_tpu.gallery.manager import GalleryManager
from facerecognitionpipeline_tpu.serve.client import (
    FaceRecognitionClient,
    synthetic_frames,
    _encode_image_base64,
)
from facerecognitionpipeline_tpu.serve.server import FaceRecognitionServer, serve


class FakeEngine:
    """Deterministic engine: every frame 'contains' student 0's face at a
    fixed location, plus one padded slot. Output shapes mirror
    RecognitionEngine._step_impl."""

    def __init__(self, gallery: GalleryManager, max_faces: int = 4, k: int = 3):
        self.gallery = gallery
        self.max_faces = max_faces
        self.k = k

    def process_frames(self, frames, templates, valid, gallery_k=3):
        b = frames.shape[0]
        f, k = self.max_faces, gallery_k
        out = {
            "bboxes": np.zeros((b, f, 4), np.float32),
            "det_scores": np.zeros((b, f), np.float32),
            "landmarks": np.zeros((b, f, 5, 2), np.float32),
            "face_valid": np.zeros((b, f), bool),
            "quality_ok": np.zeros((b, f), bool),
            "quality_metrics": {
                "det_score": np.zeros((b, f), np.float32),
                "face_size": np.full((b, f), 120.0, np.float32),
                "yaw": np.zeros((b, f), np.float32),
                "pitch": np.zeros((b, f), np.float32),
                "roll": np.zeros((b, f), np.float32),
                "blur_score": np.full((b, f), 300.0, np.float32),
            },
            "aligned": np.zeros((b, f, 112, 112, 3), np.float32),
            "embeddings": np.zeros((b, f, 512), np.float32),
            "embedding_norms": np.ones((b, f), np.float32),
            "match_scores": np.zeros((b, f, k), np.float32),
            "match_idx": np.zeros((b, f, k), np.int32),
        }
        for i in range(b):
            out["bboxes"][i, 0] = [100, 100, 220, 220]
            out["det_scores"][i, 0] = 0.95
            out["quality_metrics"]["det_score"][i, 0] = 0.95
            out["face_valid"][i, 0] = True
            out["quality_ok"][i, 0] = True
            # k-length rows so gallery_k=1/2 callers exercise the fake
            # instead of crashing on a (3,)->(k,) broadcast
            out["match_scores"][i, 0] = [0.92, 0.3, 0.1][:k] + [0.0] * (k - 3)
            out["match_idx"][i, 0] = ([0, 1, 2] + list(range(3, k)))[:k]
        return out


@pytest.fixture
def server(tmp_path, rng):
    gallery = GalleryManager(gallery_path=str(tmp_path / "g.pkl"), verbose=False)
    for i in range(3):
        emb = rng.normal(size=(2, 512)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        gallery.add_student(f"STU{i:04d}", f"Student {i}", emb)

    srv = FaceRecognitionServer(
        gallery=gallery,
        similarity_threshold=0.5,
        output_dir=str(tmp_path / "sessions"),
        engine=FakeEngine(gallery),
        max_recognition_attempts=2,
        batch_max=4,
        batch_wait_ms=2.0,
    )
    httpd = serve(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield srv, f"http://127.0.0.1:{port}", tmp_path
    httpd.shutdown()
    srv.shutdown()


def test_health_and_session_lifecycle(server, rng):
    srv, url, tmp_path = server
    r = requests.get(f"{url}/health", timeout=5)
    body = r.json()
    assert body["status"] == "ok" and body["session"] is None
    assert body["pid"] == os.getpid()  # recycle observability (in-process here)

    # frame before session -> 400
    frame = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    r = requests.post(f"{url}/process_frame",
                      json={"frame": _encode_image_base64(frame)}, timeout=10)
    assert r.status_code == 400

    r = requests.post(f"{url}/init_session",
                      json={"session_name": "t1"}, timeout=10)
    assert r.json()["status"] == "session_initialized"
    session_dir = tmp_path / "sessions" / "t1"
    assert (session_dir / "session.json").exists()
    assert (session_dir / "attendance.json").exists()

    # stream frames: the fake engine always sees student 0 at 0.92 > 0.5
    for i in range(3):
        r = requests.post(
            f"{url}/process_frame",
            json={"frame": _encode_image_base64(frame), "frame_count": i},
            timeout=30,
        )
        assert r.status_code == 200
        body = r.json()
    assert body["faces_detected"] == 1
    assert body["tracks"][0]["track_id"] == 1  # identity held across frames
    assert "1" in body["recognized_tracks"]
    assert body["recognized_tracks"]["1"]["student_id"] == "STU0000"
    assert "performance" in body

    # attendance recorded once, with schema fields
    with open(session_dir / "attendance.json") as f:
        att = json.load(f)
    assert len(att["recognized"]) == 1
    entry = att["recognized"][0]
    assert entry["student_id"] == "STU0000"
    assert entry["track_id"] == "track_0001"
    assert "detection_quality" in entry
    # face crops persisted
    rec_dir = session_dir / "recognized_faces" / "STU0000_Student_0"
    assert any(f.endswith("_aligned.png") for f in os.listdir(rec_dir))

    # snapshot
    r = requests.post(
        f"{url}/save_snapshot",
        json={"snapshot": _encode_image_base64(frame), "frame_count": 3},
        timeout=10,
    )
    assert r.json()["saved"]
    assert os.listdir(session_dir / "snapshots")

    # finalize with a client report
    r = requests.post(
        f"{url}/finalize",
        json={"client_performance_report": {"session_info": {"component": "client"}}},
        timeout=10,
    )
    assert r.json()["status"] == "finalized"
    with open(session_dir / "session.json") as f:
        sess = json.load(f)
    assert sess["status"] == "completed"
    assert sess["statistics"]["unique_students_recognized"] == 1
    assert (session_dir / "performance_report_server.json").exists()
    assert (session_dir / "performance_report_client.json").exists()


def test_client_against_server(server):
    srv, url, tmp_path = server
    client = FaceRecognitionClient(
        server_url=url,
        session_name="client_run",
        synthetic=True,
        frame_skip=2,
        max_frames=6,
        display=False,
        output_dir=str(tmp_path / "client_sessions"),
    )
    assert client.run() == 0
    # client mirrored the server's recognition state
    assert client.recognized_tracks
    # client perf report written locally and relayed to the server session
    session_dir = tmp_path / "sessions" / "client_run"
    assert (session_dir / "performance_report_client.json").exists()
    with open(session_dir / "performance_report_client.json") as f:
        report = json.load(f)
    assert report["session_info"]["component"] == "client"
    assert report["frame_statistics"]["total_frames_processed"] == 6
    assert report["frame_statistics"]["total_network_requests"] == 3


def test_client_jpeg_payload(server):
    """--image_format jpeg: ~10x smaller payloads; the server's imdecode
    handles either codec transparently."""
    srv, url, tmp_path = server
    client = FaceRecognitionClient(
        server_url=url,
        session_name="jpeg_run",
        synthetic=True,
        frame_skip=2,
        max_frames=4,
        display=False,
        output_dir=str(tmp_path / "client_sessions_jpeg"),
        image_format="jpeg",
    )
    assert client.run() == 0
    assert client.recognized_tracks  # full pipeline worked on jpeg frames


def test_batcher_coalesces_concurrent_clients(server, rng):
    """Concurrent requests share device steps through the batcher."""
    srv, url, tmp_path = server
    requests.post(f"{url}/init_session", json={"session_name": "mc"}, timeout=10)
    frame = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    payload = {"frame": _encode_image_base64(frame), "frame_count": 1}

    results = []

    def worker():
        r = requests.post(f"{url}/process_frame", json=payload, timeout=30)
        results.append(r.status_code)

    threads = [threading.Thread(target=worker) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == [200] * 6


def test_transport_mismatch_with_prebuilt_engine_rejected(tmp_path):
    """A server given a prebuilt rgb engine must reject --transport i420
    instead of silently serving full-size uploads."""
    from facerecognitionpipeline_tpu.serve.server import FaceRecognitionServer

    class _RgbEngine:
        input_format = "rgb"
        mesh = None

    with pytest.raises(ValueError, match="transport"):
        FaceRecognitionServer(
            engine=_RgbEngine(),
            output_dir=str(tmp_path),
            transport="i420",
            warmup=False,
        )


def test_raw_transport_rgb24_and_i420(server, rng):
    """/process_frame_raw: octet-stream planes, no base64/imdecode; bboxes
    come back in client coordinates via X-Frame-Scale."""
    from facerecognitionpipeline_tpu.serve import rawproto

    srv, url, tmp_path = server
    requests.post(f"{url}/init_session", json={"session_name": "raw1"}, timeout=10)
    # 1280x960 -> scale 0.5: the /scale mapping must be EXERCISED, not an
    # identity (a 480x640 frame letterboxes at scale 1.0, where dropping
    # the division entirely would still pass)
    frame = rng.integers(0, 256, (960, 1280, 3), dtype=np.uint8)
    canvas, scale = rawproto.letterbox_rgb(frame, (640, 640))
    assert scale != 1.0

    def headers(fmt):
        return {
            "Content-Type": "application/octet-stream",
            rawproto.HEADER_FORMAT: fmt,
            rawproto.HEADER_WIDTH: "640",
            rawproto.HEADER_HEIGHT: "640",
            rawproto.HEADER_SCALE: repr(scale),
            rawproto.HEADER_COUNT: "1",
        }

    r = requests.post(
        f"{url}/process_frame_raw",
        data=np.ascontiguousarray(canvas).tobytes(),
        headers=headers("rgb24"),
        timeout=30,
    )
    assert r.status_code == 200, r.text[:200]
    body = r.json()
    assert body["faces_detected"] == 1
    # fake engine reports canvas bbox [100,100,220,220]; response is /scale
    np.testing.assert_allclose(
        body["tracks"][0]["bbox"], np.array([100, 100, 220, 220]) / scale, rtol=1e-6
    )

    r = requests.post(
        f"{url}/process_frame_raw",
        data=rawproto.rgb_to_i420(canvas).tobytes(),
        headers=headers("i420"),
        timeout=30,
    )
    assert r.status_code == 200, r.text[:200]
    assert r.json()["faces_detected"] == 1


def test_raw_transport_validation(server, rng):
    from facerecognitionpipeline_tpu.serve import rawproto

    srv, url, tmp_path = server
    requests.post(f"{url}/init_session", json={"session_name": "raw2"}, timeout=10)

    base = {
        "Content-Type": "application/octet-stream",
        rawproto.HEADER_WIDTH: "640",
        rawproto.HEADER_HEIGHT: "640",
        rawproto.HEADER_SCALE: "1.0",
    }
    # unknown format
    r = requests.post(f"{url}/process_frame_raw", data=b"x",
                      headers={**base, rawproto.HEADER_FORMAT: "bgr"}, timeout=10)
    assert r.status_code == 400
    # wrong byte count
    r = requests.post(f"{url}/process_frame_raw", data=b"\0" * 100,
                      headers={**base, rawproto.HEADER_FORMAT: "rgb24"}, timeout=10)
    assert r.status_code == 400
    # wrong canvas dims
    r = requests.post(
        f"{url}/process_frame_raw",
        data=b"\0" * rawproto.payload_nbytes("rgb24", 480, 640),
        headers={**base, rawproto.HEADER_FORMAT: "rgb24",
                 rawproto.HEADER_HEIGHT: "480"},
        timeout=10,
    )
    assert r.status_code == 400
    # bad scale — including NaN, which `scale <= 0` comparisons wave through
    for bad_scale in ("0", "-1", "nan", "inf"):
        r = requests.post(
            f"{url}/process_frame_raw",
            data=b"\0" * rawproto.payload_nbytes("rgb24", 640, 640),
            headers={**base, rawproto.HEADER_FORMAT: "rgb24",
                     rawproto.HEADER_SCALE: bad_scale},
            timeout=10,
        )
        assert r.status_code == 400, bad_scale


def test_client_raw_i420_payload(server):
    """--image_format raw-i420 end-to-end: client letterboxes + converts,
    server runs zero-decode."""
    srv, url, tmp_path = server
    client = FaceRecognitionClient(
        server_url=url,
        session_name="raw_run",
        synthetic=True,
        frame_skip=2,
        max_frames=4,
        display=False,
        output_dir=str(tmp_path / "client_sessions_raw"),
        image_format="raw-i420",
        det_size=(640, 640),
    )
    assert client.run() == 0
    assert client.recognized_tracks


def test_batcher_never_dispatches_unknown_batch_shape(rng):
    """Grouped H2D uploads must combine to AT MOST max_batch frames — an
    oversized concat would jit-compile a brand-new engine shape
    mid-traffic (regression: two 6-frame groups once dispatched as B=12)."""
    from facerecognitionpipeline_tpu.serve.batcher import DeviceBatcher

    seen = []

    class RecordingEngine:
        def process_frames(self, frames, templates, valid, gallery_k=3):
            b = int(frames.shape[0])
            seen.append(b)
            f = 2
            return {
                "match_scores": np.zeros((b, f, gallery_k), np.float32),
                "match_idx": np.zeros((b, f, gallery_k), np.int32),
                "face_valid": np.zeros((b, f), bool),
            }

    batcher = DeviceBatcher(
        RecordingEngine(),
        lambda: (np.zeros((4, 8), np.float32), np.ones(4, bool)),
        max_batch=4,
        max_wait_ms=20.0,
    )
    batcher.start()
    try:
        frame = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        futs = [batcher.submit(frame) for _ in range(13)]
        for f in futs:
            r = f.result(timeout=30)
            assert r["match_scores"].shape == (2, 3)
    finally:
        batcher.stop()
    assert seen and all(b in batcher.bucket_sizes for b in seen), seen


def test_batcher_stop_fails_stranded_futures(rng):
    """stop() must resolve in-flight futures (ingress/ready/carry) with an
    error instead of leaving clients blocked in result()."""
    import queue as _queue
    from concurrent.futures import Future

    from facerecognitionpipeline_tpu.serve.batcher import DeviceBatcher

    batcher = DeviceBatcher(
        object(),  # engine never reached
        lambda: (np.zeros((2, 4), np.float32), np.ones(2, bool)),
        max_batch=2,
    )
    # never start threads; enqueue into all three stranding points
    f_ingress: Future = batcher.submit(np.zeros((4, 4, 3), np.uint8))
    f_ready: Future = Future()
    batcher._ready.put((np.zeros((1, 4, 4, 3), np.uint8), [f_ready]))
    f_carry: Future = Future()
    batcher._carry = (np.zeros((1, 4, 4, 3), np.uint8), [f_carry])
    f_done: Future = Future()
    batcher._done.put(({"match_scores": np.zeros((1, 2, 3))}, None, [f_done]))
    batcher.stop()
    for f in (f_ingress, f_ready, f_carry, f_done):
        with pytest.raises(RuntimeError, match="stopped"):
            f.result(timeout=1)


def test_concurrent_clients_no_errors(server, rng):
    """Hammer the server from 8 threads mixing b64/raw transports and
    malformed payloads: every well-formed request must return 200 and every
    malformed one 400 — never a 500. Locks in the shared-rec_result dict
    race (tracker.mark_recognized copy) and the response-shape guarantees
    under real multi-client interleaving."""
    import concurrent.futures as cf

    from facerecognitionpipeline_tpu.serve import rawproto

    srv, url, tmp_path = server
    requests.post(f"{url}/init_session", json={"session_name": "hammer"},
                  timeout=10)
    frame = rng.integers(0, 256, (640, 640, 3), dtype=np.uint8)
    # the PRODUCTION client encoding, not a hand-rolled copy that could
    # drift (BGR order, jpeg quality) from what real clients send
    b64 = _encode_image_base64(frame, image_format="jpeg")
    raw = np.ascontiguousarray(frame).tobytes()
    raw_headers = {
        "Content-Type": "application/octet-stream",
        rawproto.HEADER_FORMAT: "rgb24",
        rawproto.HEADER_WIDTH: "640",
        rawproto.HEADER_HEIGHT: "640",
        rawproto.HEADER_SCALE: "1.0",
    }
    errors: list = []

    def client(ci: int):
        s = requests.Session()
        for i in range(12):
            kind = (ci + i) % 4
            try:
                if kind == 0:
                    r = s.post(f"{url}/process_frame",
                               json={"frame": b64, "frame_count": i},
                               timeout=30)
                    expect = 200
                elif kind == 1:
                    r = s.post(f"{url}/process_frame_raw", data=raw,
                               headers=raw_headers, timeout=30)
                    expect = 200
                elif kind == 2:  # malformed: NaN scale
                    r = s.post(f"{url}/process_frame_raw", data=raw,
                               headers={**raw_headers,
                                        rawproto.HEADER_SCALE: "nan"},
                               timeout=30)
                    expect = 400
                else:  # malformed: garbage b64
                    r = s.post(f"{url}/process_frame",
                               json={"frame": "!!notb64!!"}, timeout=30)
                    expect = 400
                if r.status_code != expect:
                    errors.append(
                        f"client {ci} req {i} kind {kind}: "
                        f"{r.status_code} != {expect}: {r.text[:120]}"
                    )
                elif expect == 200:
                    body = r.json()
                    # response shape stays consistent mid-interleaving: no
                    # io-private keys may leak into recognized_tracks
                    for v in body["recognized_tracks"].values():
                        leaked = [k for k in v if k.startswith("_")]
                        if leaked:
                            errors.append(f"leaked private keys: {leaked}")
            except Exception as e:  # noqa: BLE001
                errors.append(f"client {ci} req {i}: {type(e).__name__}: {e}")

    with cf.ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(client, range(8)))
    assert not errors, errors[:5]


def test_batcher_refuses_restart_after_stop(rng):
    """stop() may leave timed-out stage threads alive watching _stop;
    start() must fail loudly instead of spawning threads that exit their
    loops immediately (a silently dead batcher)."""
    from facerecognitionpipeline_tpu.serve.batcher import DeviceBatcher

    batcher = DeviceBatcher(
        object(),
        lambda: (np.zeros((2, 4), np.float32), np.ones(2, bool)),
        max_batch=2,
    )
    batcher.start()
    batcher.stop()
    with pytest.raises(RuntimeError, match="restart"):
        batcher.start()


def test_lazy_slice_rejects_copy_false(rng):
    """numpy 2.x __array__ protocol: copy=False must raise (materializing a
    device tensor is always a copy), never silently return one."""
    import jax.numpy as jnp

    from facerecognitionpipeline_tpu.serve.batcher import _LazySlice

    view = _LazySlice(jnp.arange(12).reshape(3, 4), (1,))
    with pytest.raises(ValueError, match="copy"):
        np.asarray(view, copy=False)
    out = np.asarray(view)  # default path still materializes
    np.testing.assert_array_equal(out, np.arange(4) + 4)


def test_batcher_stop_during_slow_dispatch_fails_future(rng):
    """A dispatch whose process_frames outlives stop()'s 2 s thread join (a
    cold bucket compile takes minutes) must still resolve its futures: the
    dispatch thread puts into _done AFTER stop()'s drain ran and the
    completion thread exited. The put-then-recheck in _dispatch_run drains
    and fails such a batch itself (check-then-put left a TOCTOU window)."""
    import time as _time

    from facerecognitionpipeline_tpu.serve.batcher import DeviceBatcher

    class SlowEngine:
        input_format = "rgb"

        def host_frame_shape(self, h, w):
            return (h, w, 3)

        def process_frames(self, batch, templates, valid, gallery_k=3, **kw):
            _time.sleep(4.0)  # > stop()'s 2 s join
            b = batch.shape[0]
            return {
                "match_scores": np.zeros((b, 1, gallery_k), np.float32),
                "match_idx": np.zeros((b, 1, gallery_k), np.int32),
            }

    batcher = DeviceBatcher(
        SlowEngine(),
        lambda: (np.zeros((2, 4), np.float32), np.ones(2, bool)),
        max_batch=2,
        max_wait_ms=5,
    )
    batcher.start()
    try:
        fut = batcher.submit(np.zeros((8, 8, 3), np.uint8))
        _time.sleep(1.0)  # let the dispatch thread enter process_frames
        batcher.stop()  # joins time out; the put happens ~3 s later
        with pytest.raises(RuntimeError, match="stopped"):
            fut.result(timeout=10)
    finally:
        batcher.stop()


def test_raw_transport_400_drains_body_on_keepalive(server, rng):
    """Early 400s on /process_frame_raw must still consume the octet-stream
    body: on an HTTP/1.1 keep-alive connection, unread frame bytes would be
    parsed as the NEXT request line, corrupting every subsequent request."""
    from facerecognitionpipeline_tpu.serve import rawproto

    srv, url, tmp_path = server
    sess = requests.Session()
    sess.post(f"{url}/init_session", json={"session_name": "rawka"}, timeout=10)
    frame = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    canvas, scale = rawproto.letterbox_rgb(frame, (640, 640))
    payload = np.ascontiguousarray(canvas).tobytes()  # ~1.2 MB

    def headers(fmt):
        return {
            "Content-Type": "application/octet-stream",
            rawproto.HEADER_FORMAT: fmt,
            rawproto.HEADER_WIDTH: "640",
            rawproto.HEADER_HEIGHT: "640",
            rawproto.HEADER_SCALE: repr(scale),
            rawproto.HEADER_COUNT: "1",
        }

    # bad format -> 400 with a megabyte body on the wire
    r = sess.post(f"{url}/process_frame_raw", data=payload,
                  headers=headers("bgr"), timeout=10)
    assert r.status_code == 400
    # the SAME connection must still serve a valid request
    r = sess.post(f"{url}/process_frame_raw", data=payload,
                  headers=headers("rgb24"), timeout=30)
    assert r.status_code == 200, r.text[:200]
    assert r.json()["faces_detected"] == 1


def test_lazy_slice_views(rng):
    """_LazySlice: indexing is zero-dispatch bookkeeping; materialization
    yields exactly the requested slice with dtype/shape fidelity."""
    import jax.numpy as jnp

    from facerecognitionpipeline_tpu.serve.batcher import _LazySlice

    host = rng.standard_normal((4, 3, 8)).astype(np.float32)
    dev = jnp.asarray(host)
    view = _LazySlice(dev)
    assert view.shape == (4, 3, 8) and view.dtype == dev.dtype
    sub = view[2]
    assert sub.shape == (3, 8)
    np.testing.assert_array_equal(np.asarray(sub), host[2])
    nested = view[1][0]
    assert nested.shape == (8,)
    np.testing.assert_array_equal(np.asarray(nested), host[1][0])
    # dtype-converting materialization (np.asarray(x, dtype=...))
    np.testing.assert_allclose(
        np.asarray(view[3], dtype=np.float64), host[3].astype(np.float64)
    )


def test_batcher_submit_after_stop_fails_fast(rng):
    """A submit that races past stop() must fail its future immediately, not
    strand the caller in result(timeout=...) with no stage threads alive."""
    from facerecognitionpipeline_tpu.serve.batcher import DeviceBatcher

    batcher = DeviceBatcher(
        object(),  # engine never reached
        lambda: (np.zeros((2, 4), np.float32), np.ones(2, bool)),
        max_batch=2,
    )
    batcher.start()
    batcher.stop()
    fut = batcher.submit(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(RuntimeError, match="stopped"):
        fut.result(timeout=1)


def test_batcher_grouped_uploads_preserve_order(rng):
    """Each future must resolve to ITS OWN frame's result through group
    stacking, carry, and padding (frame identity echoed via det_scores)."""
    from facerecognitionpipeline_tpu.serve.batcher import DeviceBatcher

    class EchoEngine:
        def process_frames(self, frames, templates, valid, gallery_k=3):
            b = int(frames.shape[0])
            marker = np.asarray(frames).reshape(b, -1)[:, 0].astype(np.float32)
            return {
                "marker": marker,
                "match_scores": np.zeros((b, 2, gallery_k), np.float32),
            }

    batcher = DeviceBatcher(
        EchoEngine(),
        lambda: (np.zeros((2, 4), np.float32), np.ones(2, bool)),
        max_batch=4,
        max_wait_ms=15.0,
    )
    batcher.start()
    try:
        frames = [
            np.full((4, 4, 3), v, np.uint8) for v in rng.permutation(64)[:11]
        ]
        futs = [batcher.submit(f) for f in frames]
        for f, fut in zip(frames, futs):
            r = fut.result(timeout=30)
            assert float(r["marker"]) == float(f[0, 0, 0]), (
                "future resolved to another frame's slice"
            )
    finally:
        batcher.stop()


def test_lazy_slice_slice_index_shape(rng):
    """.shape must follow numpy indexing semantics for SLICE indices too —
    naively dropping len(idx) leading dims mis-reports them and shape-
    branching consumers (imwrite/resize guards) take the wrong path."""
    import jax.numpy as jnp

    from facerecognitionpipeline_tpu.serve.batcher import _LazySlice

    host = rng.standard_normal((4, 3, 8)).astype(np.float32)
    view = _LazySlice(jnp.asarray(host))
    sl = view[0:2]
    assert sl.shape == (2, 3, 8)
    np.testing.assert_array_equal(np.asarray(sl), host[0:2])
    # a slice after an int index (tuple-applied: dev[(1, 0:2)])
    mixed = view[1][0:2]
    assert mixed.shape == (2, 8)
    np.testing.assert_array_equal(np.asarray(mixed), host[1, 0:2])


def test_batcher_cancelled_future_does_not_poison_batch(rng):
    """A client cancelling its raw Future (always succeeds pre-completion)
    must not abort the completion fan-out for the co-batched clients."""
    import time as _time

    from facerecognitionpipeline_tpu.serve.batcher import DeviceBatcher

    class SlowEchoEngine:
        def process_frames(self, frames, templates, valid, gallery_k=3):
            _time.sleep(0.3)  # hold the batch in flight so cancel() lands
            b = int(frames.shape[0])
            marker = np.asarray(frames).reshape(b, -1)[:, 0].astype(np.float32)
            return {
                "marker": marker,
                "match_scores": np.zeros((b, 2, gallery_k), np.float32),
            }

    batcher = DeviceBatcher(
        SlowEchoEngine(),
        lambda: (np.zeros((2, 4), np.float32), np.ones(2, bool)),
        max_batch=4,
        max_wait_ms=50.0,
    )
    batcher.start()
    try:
        frames = [np.full((4, 4, 3), v, np.uint8) for v in (7, 11, 13)]
        futs = [batcher.submit(f) for f in frames]
        futs[1].cancel()
        for k in (0, 2):
            r = futs[k].result(timeout=30)
            assert float(r["marker"]) == float(frames[k][0, 0, 0])
    finally:
        batcher.stop()


def test_batcher_malformed_frame_scoped_to_its_own_future(rng):
    """One client's wrong-shape frame must fail ONLY that client — not every
    co-batched future via the all-or-nothing np.stack."""
    from facerecognitionpipeline_tpu.serve.batcher import DeviceBatcher

    class EchoEngine:
        def process_frames(self, frames, templates, valid, gallery_k=3):
            b = int(frames.shape[0])
            marker = np.asarray(frames).reshape(b, -1)[:, 0].astype(np.float32)
            return {
                "marker": marker,
                "match_scores": np.zeros((b, 2, gallery_k), np.float32),
            }

    batcher = DeviceBatcher(
        EchoEngine(),
        lambda: (np.zeros((2, 4), np.float32), np.ones(2, bool)),
        max_batch=4,
        max_wait_ms=15.0,
    )
    batcher.warmup((4, 4))  # records the canonical (4, 4, 3) frame shape
    batcher.start()
    try:
        good1 = batcher.submit(np.full((4, 4, 3), 5, np.uint8))
        bad = batcher.submit(np.zeros((5, 4, 3), np.uint8))  # wrong H
        good2 = batcher.submit(np.full((4, 4, 3), 9, np.uint8))
        with pytest.raises(ValueError, match="mismatch"):
            bad.result(timeout=30)
        assert float(good1.result(timeout=30)["marker"]) == 5.0
        assert float(good2.result(timeout=30)["marker"]) == 9.0
    finally:
        batcher.stop()


def test_reload_gallery_route(server, rng):
    """POST /reload_gallery hot-swaps enrollment from the configured pickle:
    new identities become matchable without a restart, and a missing file is
    a 400, not a 500."""
    srv, url, tmp_path = server
    assert len(srv.gallery.students) == 3

    # offline enrollment happens out-of-process: write an updated pickle
    srv.gallery.save()  # persist the fixture's in-memory records first
    offline = GalleryManager(
        gallery_path=srv.gallery.gallery_path, verbose=False
    )
    assert len(offline.students) == 3
    emb = rng.normal(size=(2, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    offline.add_student("STU9999", "Late Enrollee", emb)
    offline.save()

    r = requests.post(f"{url}/reload_gallery", json={}, timeout=10)
    assert r.status_code == 200
    body = r.json()
    assert body["status"] == "reloaded"
    assert body["num_students"] == 4
    # the device snapshot the batcher dispatches with now carries the new id
    _, _, ids = srv.gallery.device_snapshot()
    assert "STU9999" in ids

    # amplification guard: an unchanged file short-circuits to a stat call
    # (a looping client must not force repeated unpickle + device rebuilds)
    r = requests.post(f"{url}/reload_gallery", json={}, timeout=10)
    assert r.status_code == 200
    assert r.json()["status"] == "unchanged"

    # missing file -> client error, not a 500
    srv.gallery.gallery_path = str(tmp_path / "definitely_missing.pkl")
    r = requests.post(f"{url}/reload_gallery", json={}, timeout=10)
    assert r.status_code == 400
    assert "not found" in r.json()["error"]
