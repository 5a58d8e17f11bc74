"""Multi-client serving benchmark over real HTTP.

Starts the full server (real fused engine, ir_101 bf16, 640px detection) on
localhost, drives it with N concurrent synthetic 720p camera clients, and
reports req/s + per-request latency percentiles. Baseline: the reference
serves 1.33 req/s at 213 ms e2e with ONE client (BASELINE.md); its Flask
thread pool runs the full python pipeline per request.

Run:  python examples/serving_bench.py [--clients 1 4] [--seconds 30]
Prints one JSON line per client count.
"""

import argparse
import base64
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def encode_frame(frame_rgb: np.ndarray, image_format: str, det: int):
    """Same bytes the real camera client sends (serve/client.py) — the bench
    must measure the production payload, not a drifted copy.

    Returns (path, body, headers): JSON b64 for png/jpeg, octet-stream raw
    planes for raw/raw-i420 (rawproto contract)."""
    if image_format in ("raw", "raw-i420"):
        from facerecognitionpipeline_tpu.serve import rawproto

        canvas, scale = rawproto.letterbox_rgb(frame_rgb, (det, det))
        if image_format == "raw-i420":
            body, fmt = rawproto.rgb_to_i420(canvas).tobytes(), "i420"
        else:
            body, fmt = np.ascontiguousarray(canvas).tobytes(), "rgb24"
        headers = {
            "Content-Type": "application/octet-stream",
            rawproto.HEADER_FORMAT: fmt,
            rawproto.HEADER_WIDTH: str(det),
            rawproto.HEADER_HEIGHT: str(det),
            rawproto.HEADER_SCALE: repr(scale),
        }
        return "/process_frame_raw", body, headers
    from facerecognitionpipeline_tpu.serve.client import _encode_image_base64

    return "/process_frame", _encode_image_base64(frame_rgb, image_format), None


def run_clients(url: str, n_clients: int, seconds: float, payloads,
                rss_interval: float = 0.0) -> dict:
    import requests

    latencies: list = []
    counts = [0] * n_clients
    stop = time.perf_counter() + seconds

    errors: list = []
    rss_curve: list = []
    if rss_interval > 0:
        import psutil

        proc = psutil.Process()

        def sampler():
            while time.perf_counter() < stop:
                rss_curve.append(
                    {"t": round(seconds - (stop - time.perf_counter()), 1),
                     "rss_mb": round(proc.memory_info().rss / 1e6, 1),
                     "reqs": int(sum(counts))}
                )
                time.sleep(min(rss_interval, max(0.1, stop - time.perf_counter())))

        threading.Thread(target=sampler, daemon=True).start()

    def worker(ci: int):
        # collected errors, not assert: an assert kills ONLY this thread, so
        # the printed row would claim n_clients while a partial fleet ran
        # (and python -O strips asserts entirely) — same fix as
        # serving_host_ceiling.py
        i = 0
        session = requests.Session()
        try:
            while time.perf_counter() < stop:
                path, body, headers = payloads[(ci + i) % len(payloads)]
                t0 = time.perf_counter()
                if headers is None:
                    r = session.post(
                        f"{url}{path}",
                        json={"frame": body, "frame_count": i},
                        timeout=120,
                    )
                else:
                    r = session.post(
                        f"{url}{path}", data=body, headers=headers, timeout=120
                    )
                dt = time.perf_counter() - t0
                if r.status_code != 200:
                    raise RuntimeError(f"HTTP {r.status_code}: {r.text[:200]}")
                latencies.append(dt)
                counts[ci] += 1
                i += 1
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(c,)) for c in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errors:
        raise SystemExit(f"measurement invalid, worker errors: {errors[:3]}")
    lat = np.array(latencies) * 1000
    out = {
        "clients": n_clients,
        "requests": int(sum(counts)),
        "req_per_sec": round(sum(counts) / wall, 2),
        "latency_p50_ms": round(float(np.percentile(lat, 50)), 1),
        "latency_p95_ms": round(float(np.percentile(lat, 95)), 1),
    }
    if rss_curve:
        # Leak triage (PERFORMANCE.md "Serving memory behavior"): on the
        # tunneled bench rig, growth ~= payload_bytes x requests is the
        # axon client's per-transfer retention, NOT a framework leak — the
        # same load on the true-CPU backend holds RSS flat
        # (tests/test_serving_leak.py).
        grown = rss_curve[-1]["rss_mb"] - rss_curve[0]["rss_mb"]
        dreq = max(1, rss_curve[-1]["reqs"] - rss_curve[0]["reqs"])
        out["rss_first_mb"] = rss_curve[0]["rss_mb"]
        out["rss_last_mb"] = rss_curve[-1]["rss_mb"]
        out["rss_kb_per_req"] = round(grown * 1e3 / dreq, 1)
        out["rss_curve"] = rss_curve
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--clients", type=int, nargs="+", default=[1, 4])
    p.add_argument("--seconds", type=float, default=30.0)
    p.add_argument("--det", type=int, default=640)
    p.add_argument("--batch_max", type=int, default=8)
    p.add_argument("--architecture", default="ir_101")
    p.add_argument("--image_format",
                   choices=("png", "jpeg", "raw", "raw-i420"), default="png")
    p.add_argument("--transport", choices=("rgb", "i420"), default="rgb")
    p.add_argument("--quantize", choices=("int8",), default=None,
                   help="serve the int8-quantized embedder (server "
                        "--quantize; cuts device time/frame ~30%%, matters "
                        "once the link is not the ceiling)")
    p.add_argument("--embed_budget", type=int, default=None,
                   help="per-frame embed budget (see server --embed_budget)")
    p.add_argument("--rss_interval", type=float, default=0.0,
                   help="sample server RSS every N seconds during the "
                        "measured run (soak mode; see PERFORMANCE.md "
                        "'Serving memory behavior' for interpreting growth "
                        "on the tunneled rig)")
    args = p.parse_args()

    from facerecognitionpipeline_tpu.gallery.manager import GalleryManager
    from facerecognitionpipeline_tpu.serve.server import (
        FaceRecognitionServer,
        serve,
    )
    from facerecognitionpipeline_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import tempfile

    tmp = tempfile.mkdtemp(prefix="serving_bench_")
    rng = np.random.default_rng(0)
    gallery = GalleryManager(gallery_path=os.path.join(tmp, "g.pkl"), verbose=False)
    embs = rng.normal(size=(23, 4, 512)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=-1, keepdims=True)
    for i in range(23):
        gallery.add_student(f"STU{i:04d}", f"Student {i}", embs[i])

    print("Starting server (cold compile may take minutes)...", file=sys.stderr)
    srv = FaceRecognitionServer(
        gallery=gallery,
        similarity_threshold=0.5,
        output_dir=os.path.join(tmp, "sessions"),
        det_size=(args.det, args.det),
        architecture=args.architecture,
        batch_max=args.batch_max,
        max_faces=16,
        transport=args.transport,
        embed_budget=args.embed_budget,
        quantize=args.quantize,
    )
    httpd = serve(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}"

    import requests

    requests.post(f"{url}/init_session", json={"session_name": "serving_bench"},
                  timeout=30)

    # 720p synthetic camera frames (same as round-1 measurement protocol)
    payloads = [
        encode_frame(rng.integers(0, 256, (720, 1280, 3), dtype=np.uint8),
                     args.image_format, args.det)
        for _ in range(4)
    ]

    try:
        for n in args.clients:
            # settle: one throwaway request per client
            run_clients(url, n, min(5.0, args.seconds / 4), payloads)
            result = run_clients(url, n, args.seconds, payloads,
                                 rss_interval=args.rss_interval)
            result["image_format"] = args.image_format
            result["transport"] = args.transport
            result["embed_budget"] = args.embed_budget
            result["baseline_req_per_sec"] = 1.33
            result["vs_baseline"] = round(result["req_per_sec"] / 1.33, 2)
            print(json.dumps(result), flush=True)
    finally:
        httpd.shutdown()
        srv.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
