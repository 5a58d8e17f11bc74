"""Fused-step timing at production gallery scale: dense vs streaming match.

The flagship bench runs a 1024-id gallery, where matching is noise next to
the ir_101 embedder. This profile scales G to 10^5-10^6 identities and
measures the FULL fused step (detect+align+gate+embed+match, B x 640px
frames, ir_101 bf16) with the match stage as (a) the dense matmul + top-k
(XLA materializes a [Q, G] similarity block in HBM) and (b) the fused
Pallas streaming kernel (`gallery_impl='streaming'`: bf16 template chunks
through VMEM with a running top-k — HBM traffic is ONE read of the
gallery). Templates are served in bf16 at this scale, exactly what
GalleryManager.device_snapshot hands the serving batcher.

Fetch-verified sync, chained steps, roundtrip-subtracted — bench.py
methodology.

Run:  python examples/profile_gallery_scale.py [--sizes 131072 1048576]
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
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[1024, 131072, 1048576])
    ap.add_argument("--impls", type=str, nargs="+",
                    default=["dense", "streaming"])
    ap.add_argument("--chain", type=int, default=5)
    ap.add_argument("--samples", type=int, default=4)
    args = ap.parse_args()

    from facerecognitionpipeline_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax.numpy as jnp

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
    frames = jnp.asarray(
        rng.integers(0, 256, size=(B, args.det, args.det, 3), dtype=np.uint8)
    )

    def measure(g, impl):
        # build templates straight on device in bf16 (a [G,512] f32 host
        # upload at G=1M would take minutes through a tunneled link)
        key = __import__("jax").random.PRNGKey(0)
        t = __import__("jax").random.normal(key, (g, 512), dtype=jnp.float32)
        t = t / jnp.linalg.norm(t, axis=1, keepdims=True)
        if impl == "streaming_int8":
            # int8 codes + per-row scales: half the HBM gallery bytes of
            # bf16 (the streaming kernel is HBM-read bound)
            from facerecognitionpipeline_tpu.ops.pallas_gallery import (
                quantize_templates,
            )

            t = quantize_templates(t)
            engine_impl = "streaming"
        else:
            t = t.astype(jnp.bfloat16)
            engine_impl = impl
        valid = jnp.ones((g,), bool)
        eng = RecognitionEngine(
            detector, embedder, top_k=3, gallery_impl=engine_impl,
        )

        def step():
            return eng._step(
                detector.variables, embedder.variables, t, valid, frames,
                gallery_k=3,
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
        sync_ok = all(w > rt * 1.05 for w in walls)
        corr = rt if sync_ok else 0.0
        times = np.array([(w - corr) / args.chain for w in walls])
        print(json.dumps({
            "gallery_size": g,
            "gallery_impl": impl,
            "p50_step_ms": round(float(np.percentile(times, 50) * 1000), 2),
            "faces_per_sec": round(B * F / times.mean(), 1),
            "sync": "fetch-verified" if sync_ok else
                    "fetch-verified (roundtrip probe exceeded chain window; "
                    "uncorrected)",
        }), flush=True)

    for g in args.sizes:
        for impl in args.impls:
            if impl.startswith("streaming") and g % 4096:
                continue  # chunk-divisibility (pad in real deployments)
            measure(g, impl)
    return 0


if __name__ == "__main__":
    sys.exit(main())
