"""RSS soak across worker recycles (--max_requests) on the real engine.

PERFORMANCE.md's serving soak bisected ~0.6 MB/request of RSS retained by
this image's device-tunnel client — memory the framework cannot free.
`--max_requests` is the operational answer (VERDICT r3 #6): bounded-
lifetime workers that drain, persist session state, and get respawned by
the built-in supervisor. This soak demonstrates the bound: it launches
the supervised server, streams frames, samples the ACTIVE worker's RSS
(pid from /health) every few requests, and reports per-generation RSS
growth vs the across-recycle reset.

Run:  python examples/recycle_soak.py [--frames 300] [--max_requests 120]
Writes reports/serving_recycle_soak.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb(pid: int) -> float | None:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        return None
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--max_requests", type=int, default=120)
    ap.add_argument("--port", type=int, default=5181)
    ap.add_argument("--output", type=str,
                    default="reports/serving_recycle_soak.json")
    args = ap.parse_args()

    import requests

    from facerecognitionpipeline_tpu.gallery.manager import GalleryManager
    from facerecognitionpipeline_tpu.serve.client import _encode_image_base64

    tmp = tempfile.mkdtemp(prefix="recycle_soak_")
    rng = np.random.default_rng(0)
    gallery = GalleryManager(gallery_path=os.path.join(tmp, "g.pkl"),
                             verbose=False)
    for i in range(3):
        emb = rng.normal(size=(2, 512)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        gallery.add_student(f"STU{i:04d}", f"Student {i}", emb)
    gallery.save()

    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + ":" + env.get("PYTHONPATH", "")
    )
    proc = subprocess.Popen(
        [sys.executable, "-m", "facerecognitionpipeline_tpu.serve.server",
         "--gallery_path", os.path.join(tmp, "g.pkl"),
         "--output_dir", os.path.join(tmp, "sessions"),
         "--port", str(args.port), "--host", "127.0.0.1",
         "--architecture", "ir_18", "--max_faces", "8", "--batch_max", "2",
         "--max_requests", str(args.max_requests)],
        env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    url = f"http://127.0.0.1:{args.port}"
    samples = []
    try:
        # wait for gen-1 warmup (cold compile can take minutes)
        deadline = time.time() + 600
        while time.time() < deadline:
            try:
                requests.get(f"{url}/health", timeout=3)
                break
            except requests.RequestException:
                time.sleep(5)
        else:
            raise RuntimeError("server never came up")
        requests.post(f"{url}/init_session",
                      json={"session_name": "soak"}, timeout=10)

        frame = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
        payload = {"frame": _encode_image_base64(frame)}
        sent = 0
        while sent < args.frames:
            try:
                r = requests.post(f"{url}/process_frame",
                                  json={**payload, "frame_count": sent},
                                  timeout=120)
                if r.status_code != 200:
                    time.sleep(1)
                    continue
            except requests.RequestException:
                # worker draining/respawning (gen-2 warmup is compile-cached
                # so this window is short); keep trying
                time.sleep(5)
                continue
            sent += 1
            if sent % 10 == 0:
                try:
                    pid = requests.get(f"{url}/health",
                                       timeout=5).json()["pid"]
                except requests.RequestException:
                    continue
                m = rss_mb(pid)
                if m is not None:
                    samples.append(
                        {"frame": sent, "pid": pid, "rss_mb": round(m, 1)}
                    )
                    print(json.dumps(samples[-1]), flush=True)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()

    # per-generation summary
    gens = {}
    for s in samples:
        gens.setdefault(s["pid"], []).append(s)
    summary = {
        "frames_sent": args.frames,
        "max_requests": args.max_requests,
        "generations": [
            {
                "pid": pid,
                "n_samples": len(rows),
                "rss_first_mb": rows[0]["rss_mb"],
                "rss_last_mb": rows[-1]["rss_mb"],
                "growth_mb": round(rows[-1]["rss_mb"] - rows[0]["rss_mb"], 1),
            }
            for pid, rows in gens.items()
        ],
        "samples": samples,
    }
    os.makedirs(os.path.dirname(args.output), exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(summary, f, indent=2)
    n_gens = len(gens)
    print(f"\n{n_gens} worker generation(s) observed; per-generation "
          f"growth: {[g['growth_mb'] for g in summary['generations']]} MB")
    if n_gens >= 2:
        firsts = [g["rss_first_mb"] for g in summary["generations"]]
        print(f"RSS resets across recycles: generation starts at {firsts} MB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
