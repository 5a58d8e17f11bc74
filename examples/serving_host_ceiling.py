"""Host-path serving ceiling: the full HTTP edge with the device stubbed.

Answers "is the stdlib HTTP server the multi-client ceiling?" by running
the REAL serving path — ThreadingHTTPServer, rawproto parse, batcher
machinery, tracking, JSON responses — against a zero-cost fake engine, on
CPU. Whatever req/s this sustains is the hard upper bound any device-side
speedup could reach; conversely, if it far exceeds the real-engine curve,
the ceiling is the device side (on this image: the ~32 MB/s tunnel), not
the host.

Round-3 measurement on the single-core host (raw-i420 640px payloads):

    clients 1: 19.1 req/s   clients 4: 61.3   clients 8: 118.5
    clients 12: 157.9 req/s (still climbing)

vs ~31 req/s real-engine peak — so the HTTP edge has ~5x headroom and
the real curve is device-link-bound, NOT "stdlib HTTP handling" as the
round-2 PERFORMANCE.md draft claimed. See PERFORMANCE.md "Serving".

Run:  python examples/serving_host_ceiling.py [--clients 1 4 8 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = ""
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


class ZeroCostEngine:
    """Engine stub with RecognitionEngine's output contract: one valid
    face per frame, everything else padding (mirrors tests/test_server.py
    FakeEngine, kept dependency-free here)."""

    def __init__(self, max_faces: int = 16, k: int = 3,
                 input_format: str = "rgb"):
        self.max_faces = max_faces
        self.k = k
        # match the transport under test: with input_format='i420' the
        # server ships raw i420 payloads straight through, exactly like the
        # real raw-i420 + --transport i420 configuration this ceiling is
        # compared against — a default-'rgb' stub made every request pay an
        # i420->RGB host conversion the real curve never pays
        self.input_format = input_format

    def host_frame_shape(self, h, w):
        return (h * 3 // 2, w) if self.input_format == "i420" else (h, w, 3)

    def process_frames(self, frames, templates, valid, gallery_k=3):
        b = int(frames.shape[0])
        f, k = self.max_faces, gallery_k
        out = {
            "bboxes": np.zeros((b, f, 4), np.float32),
            "det_scores": np.zeros((b, f), np.float32),
            "landmarks": np.zeros((b, f, 5, 2), np.float32),
            "face_valid": np.zeros((b, f), bool),
            "quality_ok": np.zeros((b, f), bool),
            "quality_metrics": {
                m: np.zeros((b, f), np.float32)
                for m in ("det_score", "face_size", "yaw", "pitch", "roll",
                          "blur_score")
            },
            "aligned": np.zeros((b, f, 112, 112, 3), np.uint8),
            "embeddings": np.zeros((b, f, 512), np.float32),
            "embedding_norms": np.ones((b, f), np.float32),
            "match_scores": np.zeros((b, f, k), np.float32),
            "match_idx": np.zeros((b, f, k), np.int32),
        }
        out["bboxes"][:, 0] = [100, 100, 220, 220]
        out["det_scores"][:, 0] = 0.95
        out["quality_metrics"]["det_score"][:, 0] = 0.95
        out["quality_metrics"]["face_size"][:, 0] = 120.0
        out["quality_metrics"]["blur_score"][:, 0] = 300.0
        out["face_valid"][:, 0] = True
        out["quality_ok"][:, 0] = True
        out["match_scores"][:, 0, 0] = 0.92
        return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, nargs="+", default=[1, 4, 8, 12])
    ap.add_argument("--seconds", type=float, default=12.0)
    ap.add_argument("--det", type=int, default=640)
    ap.add_argument("--transport", choices=("rgb", "i420"), default="i420",
                    help="i420 (default) matches the raw-i420 serving "
                         "configuration this ceiling is compared against")
    args = ap.parse_args()

    from facerecognitionpipeline_tpu.gallery.manager import GalleryManager
    from facerecognitionpipeline_tpu.serve import rawproto
    from facerecognitionpipeline_tpu.serve.server import (
        FaceRecognitionServer,
        serve,
    )

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    gallery = GalleryManager(
        gallery_path=os.path.join(tmp, "g.pkl"), verbose=False
    )
    emb = rng.normal(size=(2, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    gallery.add_student("STU0000", "Student 0", emb)

    det = args.det
    srv = FaceRecognitionServer(
        gallery=gallery,
        output_dir=os.path.join(tmp, "sessions"),
        engine=ZeroCostEngine(input_format=args.transport),
        det_size=(det, det),
        batch_max=8,
        batch_wait_ms=5.0,
        transport=args.transport,
    )
    httpd = serve(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    import requests

    url = f"http://127.0.0.1:{port}"
    requests.post(
        f"{url}/init_session", json={"session_name": "ceiling"}, timeout=10
    )

    frame = rng.integers(0, 256, (720, 1280, 3), dtype=np.uint8)
    canvas, scale = rawproto.letterbox_rgb(frame, (det, det))
    # Ship the payload in the SAME format as the transport under test —
    # otherwise `--transport rgb` would still send i420 planes and the
    # server would pay a host i420->rgb conversion the real raw-rgb24
    # configuration never pays (skewing the measured ceiling).
    if args.transport == "i420":
        body = rawproto.rgb_to_i420(canvas).tobytes()
        wire_fmt = "i420"
    else:
        body = np.ascontiguousarray(canvas).tobytes()
        wire_fmt = "rgb24"
    headers = {
        "Content-Type": "application/octet-stream",
        rawproto.HEADER_FORMAT: wire_fmt,
        rawproto.HEADER_WIDTH: str(det),
        rawproto.HEADER_HEIGHT: str(det),
        rawproto.HEADER_SCALE: repr(scale),
    }

    for n_clients in args.clients:
        counts = [0] * n_clients
        lat: list = []
        errors: list = []
        stop = time.perf_counter() + args.seconds

        def worker(ci: int):
            # record failures instead of letting an assert silently kill
            # this one thread — a partial fleet prints a wrong req/s
            try:
                s = requests.Session()
                while time.perf_counter() < stop:
                    t0 = time.perf_counter()
                    r = s.post(
                        f"{url}/process_frame_raw",
                        data=body,
                        headers=headers,
                        timeout=60,
                    )
                    if r.status_code != 200:
                        raise RuntimeError(
                            f"HTTP {r.status_code}: {r.text[:200]}"
                        )
                    lat.append(time.perf_counter() - t0)
                    counts[ci] += 1
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        ts = [
            threading.Thread(target=worker, args=(c,))
            for c in range(n_clients)
        ]
        t0 = time.perf_counter()
        [t.start() for t in ts]
        [t.join() for t in ts]
        dt = time.perf_counter() - t0
        if errors:
            raise SystemExit(f"measurement invalid, worker errors: {errors[:3]}")
        print(
            json.dumps(
                {
                    "clients": n_clients,
                    "req_s": round(sum(counts) / dt, 1),
                    "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
                    "engine": "zero-cost stub (host path only)",
                }
            ),
            flush=True,
        )
    srv.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
