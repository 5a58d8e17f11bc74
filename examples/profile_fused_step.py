"""Stage breakdown of the fused recognition step on the real chip.

Times each sub-stage of the bench configuration (B=8 frames x 32 face slots,
640px, ir_101 bf16) as its own jitted program, plus the full fused step, so
optimization work targets the dominant stage. Uses the same fetch-verified
sync + chained-steps methodology as bench.py (block_until_ready does not
reliably synchronize through this image's device tunnel).

Run:  python examples/profile_fused_step.py [--b 8] [--faces 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--faces", type=int, default=32)
    ap.add_argument("--det", type=int, default=640)
    ap.add_argument("--chain", type=int, default=5)
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--quantize", type=str, default=None, choices=["int8"],
                    help="profile the int8-quantized embedder instead of bf16")
    args = ap.parse_args()

    from facerecognitionpipeline_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from facerecognitionpipeline_tpu.gallery.search import (
        DeviceGallery,
        cosine_topk,
    )
    from facerecognitionpipeline_tpu.models.detector import MTCNNDetector
    from facerecognitionpipeline_tpu.ops.image import normalize_face_batch
    from facerecognitionpipeline_tpu.ops.quality import quality_check
    from facerecognitionpipeline_tpu.ops.warp import (
        align_faces_matmul,
        reference_template,
    )
    from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder
    from facerecognitionpipeline_tpu.pipeline.engine import RecognitionEngine

    B, F, DET = args.b, args.faces, args.det
    rng = np.random.default_rng(0)

    detector = MTCNNDetector(
        det_size=(DET, DET), max_faces=F, min_face_size=40, dtype=jnp.bfloat16
    )
    embedder = FaceEmbedder(
        architecture="ir_101", dtype=jnp.bfloat16, quantize=args.quantize
    )
    engine = RecognitionEngine(detector, embedder, top_k=3)

    gallery = DeviceGallery()
    templates = rng.normal(size=(1024, 512)).astype(np.float32)
    templates /= np.linalg.norm(templates, axis=1, keepdims=True)
    gallery.rebuild([f"id{i}" for i in range(1024)], templates)

    frames = jnp.asarray(
        rng.integers(0, 256, size=(B, DET, DET, 3), dtype=np.uint8)
    )
    frames_f32 = frames.astype(jnp.float32)
    template = jnp.asarray(reference_template(112))

    # Pre-computed stage inputs (so each stage times ONLY itself).
    det_out = jax.jit(
        lambda v, f: detector._detect_batch(v, f)
    )(detector.variables, frames_f32)
    det_out = jax.tree.map(lambda a: a.copy(), det_out)

    aligned0 = jax.jit(
        jax.vmap(
            lambda img, lmk: align_faces_matmul(img, lmk, template, 112)
        )
    )(frames_f32, det_out["landmarks"])

    feats0, _ = jax.jit(
        lambda v, x: embedder.model.apply(v, x)
    )(
        embedder.variables,
        normalize_face_batch(
            aligned0.reshape(B * F, 112, 112, 3), dtype=jnp.bfloat16
        ),
    )

    def sync(x) -> None:
        # Fetch ONE element (device-side slice first): pulling a whole leaf
        # through the ~32 MB/s tunnel would swamp the measurement.
        leaf = jax.tree.leaves(x)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    # Host<->device fetch round-trip, measured like bench.py (min of 5
    # drained probes) and subtracted from every chained sample — without
    # this each stage gains roundtrip/chain ms and the sum-vs-fused
    # comparison skews by ~n_stages x that.
    np.asarray(jnp.zeros(()))
    _rt_probes = []
    for _ in range(5):
        _t = time.perf_counter()
        np.asarray(jnp.zeros(()))
        _rt_probes.append(time.perf_counter() - _t)
    roundtrip = min(_rt_probes)

    def timed(name: str, fn, *a):
        f = jax.jit(fn)
        sync(f(*a))  # compile
        sync(f(*a))  # settle
        walls = []
        for _ in range(args.samples):
            t0 = time.perf_counter()
            out = None
            for _ in range(args.chain):
                out = f(*a)
            sync(out)
            walls.append(time.perf_counter() - t0)
        # bench.py's over-correction guard: a roundtrip probe that caught
        # the tunnel mid-hiccup can EXCEED a cheap stage's chained window —
        # silently clamping would print a 10x under-reported stage time
        # into the PERFORMANCE.md table. One basis for all samples, chosen
        # by the MEDIAN wall (an all() gate let a single borderline sample
        # flip the whole run to uncorrected — bimodal numbers run-to-run
        # on this ±25% rig).
        corr = roundtrip if float(np.median(walls)) > roundtrip * 1.05 else 0.0
        flag = "" if corr else "  [UNCORRECTED: probe exceeded chain window]"
        per = [(w - corr) / args.chain for w in walls]
        ms = float(np.median(per) * 1000)
        print(f"{name:34s} {ms:8.2f} ms{flag}")
        return ms

    prec = "int8" if args.quantize else "bf16"
    print(f"config: B={B} F={F} det={DET} ir_101 {prec}  (chained x{args.chain})")

    res = {}
    res["detect (cascade)"] = timed(
        "detect (cascade)",
        lambda v, f: detector._detect_batch(v, f),
        detector.variables,
        frames_f32,
    )

    def stage1_only(v, f):
        img = (f.astype(jnp.float32) - 127.5) / 128.0
        return jax.vmap(lambda im: detector._stage1(v, im))(img)

    res["  stage1 (pnet pyramid+nms)"] = timed(
        "  stage1 (pnet pyramid+nms)", stage1_only, detector.variables, frames_f32
    )

    s1 = jax.jit(stage1_only)(detector.variables, frames_f32)
    s1 = jax.tree.map(lambda a: a.copy(), s1)

    def stage2_only(v, f, boxes, scores, valid):
        img = (f.astype(jnp.float32) - 127.5) / 128.0
        return jax.vmap(
            lambda im, b, s, va: detector._stage2(v, im, b, s, va)
        )(img, boxes, scores, valid)

    res["  stage2 (rnet)"] = timed(
        "  stage2 (rnet)", stage2_only, detector.variables, frames_f32, *s1
    )

    s2 = jax.jit(stage2_only)(detector.variables, frames_f32, *s1)
    s2 = jax.tree.map(lambda a: a.copy(), s2)

    def stage3_only(v, f, boxes, scores, valid):
        img = (f.astype(jnp.float32) - 127.5) / 128.0
        return jax.vmap(
            lambda im, b, s, va: detector._stage3(v, im, b, s, va)
        )(img, boxes, scores, valid)

    res["  stage3 (onet)"] = timed(
        "  stage3 (onet)", stage3_only, detector.variables, frames_f32, *s2
    )

    # On TPU the fused step uses the Pallas align, so the matmul row is
    # the ALTERNATIVE implementation (indented = excluded from the sum);
    # on CPU it IS the engine's align path and belongs in the sum.
    _align_mm = (
        "  align (matmul warp, alt)"
        if jax.default_backend() == "tpu"
        else "align (matmul warp)"
    )
    res[_align_mm] = timed(
        _align_mm,
        lambda f, l: jax.vmap(
            lambda img, lmk: align_faces_matmul(img, lmk, template, 112)
        )(f, l),
        frames_f32,
        det_out["landmarks"],
    )

    if jax.default_backend() == "tpu":
        # the engine's actual align path on TPU — counted in the sum; the
        # matmul row above is the alternative implementation (indented =
        # excluded from 'sum of stages')
        from facerecognitionpipeline_tpu.ops.warp import align_faces_batch_pallas

        res["align (pallas stage-B)"] = timed(
            "align (pallas stage-B)",
            lambda f, l: align_faces_batch_pallas(f, l, template, 112),
            frames_f32,
            det_out["landmarks"],
        )

    res["quality gate"] = timed(
        "quality gate",
        lambda det, al: jax.vmap(
            lambda s, b, l, a, v: quality_check(
                s, b, l, engine.quality_config, aligned_faces=a, valid_mask=v
            )
        )(det["scores"], det["bboxes"], det["landmarks"], al, det["valid"]),
        det_out,
        aligned0,
    )

    res["embed (ir_101 x %d)" % (B * F)] = timed(
        "embed (ir_101 x %d)" % (B * F),
        lambda v, al: embedder.model.apply(
            v,
            normalize_face_batch(
                al.reshape(B * F, 112, 112, 3), dtype=jnp.bfloat16
            ),
        ),
        embedder.variables,
        aligned0,
    )

    res["gallery topk (1024)"] = timed(
        "gallery topk (1024)",
        lambda q, t, va: cosine_topk(q.reshape(B * F, -1), t, va, 3),
        feats0,
        gallery._templates,
        gallery._valid,
    )

    res["FULL fused step"] = timed(
        "FULL fused step",
        lambda dv, ev, t, va, f: engine._step_impl(dv, ev, t, va, f, gallery_k=3),
        detector.variables,
        embedder.variables,
        gallery._templates,
        gallery._valid,
        frames,
    )

    total = sum(
        v for k, v in res.items() if not k.startswith(" ") and k != "FULL fused step"
    )
    print(f"{'sum of stages':34s} {total:8.2f} ms")
    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
