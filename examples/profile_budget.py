"""Embed-budget step timing: dense vs budgeted fused step on the real chip.

Produces the PERFORMANCE.md "Embed budget" table: p50 step time of the
bench configuration (B=8 x 640px frames, 32 face slots, ir_101 bf16,
1024-id gallery) with the engine embedding all slots (dense) vs only the
K best eligible faces per frame (embed_budget=K). Fetch-verified sync,
chained steps, roundtrip-subtracted — bench.py methodology.

Run:  python examples/profile_budget.py [--budgets 16 8 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--faces", type=int, default=32)
    ap.add_argument("--det", type=int, default=640)
    ap.add_argument("--budgets", type=int, nargs="+", default=[16, 8, 4])
    ap.add_argument("--chain", type=int, default=5)
    ap.add_argument("--samples", type=int, default=4)
    args = ap.parse_args()

    from facerecognitionpipeline_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax.numpy as jnp

    from facerecognitionpipeline_tpu.gallery.search import DeviceGallery
    from facerecognitionpipeline_tpu.models.detector import MTCNNDetector
    from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder
    from facerecognitionpipeline_tpu.pipeline.engine import RecognitionEngine

    B, F = args.b, args.faces
    rng = np.random.default_rng(0)
    detector = MTCNNDetector(
        det_size=(args.det, args.det), max_faces=F, min_face_size=40,
        dtype=jnp.bfloat16,
    )
    embedder = FaceEmbedder(architecture="ir_101", dtype=jnp.bfloat16)
    gallery = DeviceGallery()
    t = rng.normal(size=(1024, 512)).astype(np.float32)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    gallery.rebuild([f"id{i}" for i in range(1024)], t)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(B, args.det, args.det, 3), dtype=np.uint8)
    )

    def measure(budget):
        eng = RecognitionEngine(
            detector, embedder, top_k=3, embed_budget=budget
        )

        def step():
            return eng._step(
                detector.variables, embedder.variables, gallery._templates,
                gallery._valid, frames, gallery_k=3,
            )

        def sync(o):
            np.asarray(o["match_scores"][0, 0])

        sync(step())
        sync(step())
        sync(step())
        probes = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(jnp.zeros(()))
            probes.append(time.perf_counter() - t0)
        rt = min(probes)
        walls = []
        for _ in range(args.samples):
            t0 = time.perf_counter()
            o = None
            for _ in range(args.chain):
                o = step()
            sync(o)
            walls.append(time.perf_counter() - t0)
        # bench.py's over-correction guard: a roundtrip probe can catch the
        # tunnel mid-hiccup and come out LARGER than a chained window —
        # subtracting it would print negative step times. One basis for all
        # samples: corrected when every wall clears the probe, else
        # uncorrected + flagged.
        sync_ok = all(w > rt * 1.05 for w in walls)
        corr = rt if sync_ok else 0.0
        times = np.array([(w - corr) / args.chain for w in walls])
        print(json.dumps({
            "budget": budget,
            "p50_step_ms": round(float(np.percentile(times, 50) * 1000), 2),
            "frames_per_sec": round(B / times.mean(), 1),
            "embeds_per_step": B * (budget or F),
            "sync": "fetch-verified" if sync_ok else
                    "fetch-verified (roundtrip probe exceeded chain window; "
                    "uncorrected)",
        }), flush=True)

    for budget in [None] + args.budgets:
        measure(budget)
    return 0


if __name__ == "__main__":
    sys.exit(main())
