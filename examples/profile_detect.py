"""In-detect bisect: where the cascade's milliseconds go on the real chip.

The full-step bisect (profile_fused_step.py) shows detect as one ~7 ms
number; this script splits it into cumulative sub-programs — pyramid
resizes, P-net convs + per-scale top-k, stage-1 NMS, stage-2 crops, R-net,
stage-3 crops, O-net — each jitted and timed with the same chained +
fetch-verified methodology, so optimization targets the real cost.

Run:  python examples/profile_detect.py [--b 8] [--det 640]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--det", type=int, default=640)
    ap.add_argument("--chain", type=int, default=5)
    ap.add_argument("--samples", type=int, default=3)
    args = ap.parse_args()

    from facerecognitionpipeline_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from facerecognitionpipeline_tpu.models.detector import MTCNNDetector
    from facerecognitionpipeline_tpu.ops.warp import crop_resize

    B, DET = args.b, args.det
    rng = np.random.default_rng(0)
    det = MTCNNDetector(
        det_size=(DET, DET), max_faces=32, min_face_size=40, dtype=jnp.bfloat16
    )
    frames = jnp.asarray(
        rng.integers(0, 256, size=(B, DET, DET, 3), dtype=np.uint8)
    )

    h = w = DET
    _NEG = -1e9

    # --- cumulative sub-programs over ONE frame (vmapped over B) ---------

    def norm(frame):
        return (frame.astype(jnp.float32) - 127.5) / 128.0

    def prog_pyr(v, frame):
        img = norm(frame)
        return sum(o.sum() for o in det._pyramid(img))

    def prog_pyr_direct(v, frame):
        # the pre-round-3 construction: every level resized from the frame
        img = norm(frame)
        outs = []
        for scale in det.scales:
            sh = int(math.ceil(h * scale))
            sw = int(math.ceil(w * scale))
            outs.append(jax.image.resize(img, (sh, sw, 3), method="linear"))
        return sum(o.sum() for o in outs)

    def pnet_scale(v, img, scale):
        sh = int(math.ceil(h * scale))
        sw = int(math.ceil(w * scale))
        scaled = jax.image.resize(img, (sh, sw, 3), method="linear")
        prob, reg = det.pnet.apply(v["pnet"], scaled[None])
        prob, reg = prob[0], reg[0]
        ph, pw = prob.shape
        k = min(128, ph * pw)
        top_p, top_i = jax.lax.top_k(prob.reshape(-1), k)
        return top_p, top_i, reg

    def prog_pnet(v, frame):
        img = norm(frame)
        acc = 0.0
        for scale in det.scales:
            top_p, top_i, reg = pnet_scale(v, img, scale)
            acc = acc + top_p.sum() + reg.sum() + top_i.sum()
        return acc

    def prog_s1(v, frame):
        img = norm(frame)
        b, s, val = det._stage1(v, img)
        return b.sum() + s.sum() + val.sum()

    def prog_s2crop(v, frame):
        img = norm(frame)
        boxes, scores, valid = det._stage1(v, img)
        from facerecognitionpipeline_tpu.models.detector import _square

        sq = jnp.clip(_square(boxes), 0, max(h, w))
        d = det.rnet_crop_downscale
        s = max(h, w) // d
        small = crop_resize(
            img, jnp.array([[0.0, 0.0, float(w), float(h)]], jnp.float32), s,
            compute_dtype=det._crop_dtype,
        )[0]
        sx, sy = s / float(w), s / float(h)
        small_boxes = sq * jnp.array([sx, sy, sx, sy], jnp.float32)
        crops = det._crop(small, small_boxes, 24)
        return crops.sum() + scores.sum() + valid.sum()

    def prog_s2(v, frame):
        img = norm(frame)
        st = det._stage1(v, img)
        b, s, val = det._stage2(v, img, *st)
        return b.sum() + s.sum() + val.sum()

    def prog_s3crop(v, frame):
        img = norm(frame)
        st = det._stage1(v, img)
        boxes, scores, valid = det._stage2(v, img, *st)
        from facerecognitionpipeline_tpu.models.detector import _square

        sq = jnp.clip(_square(boxes), 0, max(h, w))
        crops = det._crop(img, sq, 48)
        return crops.sum() + scores.sum() + valid.sum()

    def prog_s2rnet(v, frame):
        # stage2 through the R-net conv, but no NMS/topk afterwards
        img = norm(frame)
        boxes, scores, valid = det._stage1(v, img)
        from facerecognitionpipeline_tpu.models.detector import _square

        sq = jnp.clip(_square(boxes), 0, max(h, w))
        d = det.rnet_crop_downscale
        s = max(h, w) // d
        small = crop_resize(
            img, jnp.array([[0.0, 0.0, float(w), float(h)]], jnp.float32), s,
            compute_dtype=det._crop_dtype,
        )[0]
        sx, sy = s / float(w), s / float(h)
        small_boxes = sq * jnp.array([sx, sy, sx, sy], jnp.float32)
        crops = det._crop(small, small_boxes, 24)
        prob, reg = det.rnet.apply(v["rnet"], crops)
        return prob.sum() + reg.sum() + scores.sum() + valid.sum()

    def prog_s3onet(v, frame):
        # full stage2, stage3 crops + O-net conv, no final NMS/topk
        img = norm(frame)
        st = det._stage1(v, img)
        boxes, scores, valid = det._stage2(v, img, *st)
        from facerecognitionpipeline_tpu.models.detector import _square

        sq = jnp.clip(_square(boxes), 0, max(h, w))
        crops = det._crop(img, sq, 48)
        prob, reg, lmk = det.onet.apply(v["onet"], crops)
        return prob.sum() + reg.sum() + lmk.sum() + scores.sum() + valid.sum()

    def prog_full(v, frame):
        out = det._cascade(v, frame)
        return out["bboxes"].sum() + out["scores"].sum() + out["valid"].sum()

    progs = [
        ("pyramid progressive", prog_pyr),
        ("pyramid direct (old)", prog_pyr_direct),
        ("stage1 (full s1)", prog_s1),
        ("+ s2 crops", prog_s2crop),
        ("+ rnet conv", prog_s2rnet),
        ("+ s2 nms/topk (full s2)", prog_s2),
        ("+ s3 crops", prog_s3crop),
        ("+ onet conv", prog_s3onet),
        ("+ final nms (full cascade)", prog_full),
    ]

    def sync(x) -> None:
        np.asarray(jax.device_get(x))

    # Fetch round-trip: each timed sample ends in ONE scalar fetch whose
    # host<->device latency (~27 ms through this image's tunnel) would
    # otherwise smear +roundtrip/chain into EVERY row — which is how round
    # 3 briefly attributed ~5.4 phantom ms to the pyramid resizes. Measure
    # it and subtract (same discipline as bench.py:90-118).
    sync(jnp.zeros(()))
    probes = []
    for _ in range(5):
        t_rt = time.perf_counter()
        sync(jnp.zeros(()))
        probes.append(time.perf_counter() - t_rt)
    roundtrip = min(probes)
    print(f"fetch roundtrip: {roundtrip * 1e3:.2f} ms", file=sys.stderr)

    results = {}
    prev = 0.0
    for name, fn in progs:
        jitted = jax.jit(jax.vmap(fn, in_axes=(None, 0)))
        out = jitted(det.variables, frames)
        sync(out[0])  # compile + warm
        times = []
        for _ in range(args.samples):
            t0 = time.perf_counter()
            for _ in range(args.chain):
                out = jitted(det.variables, frames)
            sync(out[0])
            wall = time.perf_counter() - t0
            if wall > roundtrip * 1.05:
                wall -= roundtrip
            times.append(wall / args.chain * 1e3)
        ms = float(np.min(times))
        results[name] = ms
        print(f"{name:42s} {ms:8.2f} ms   (delta {ms - prev:+7.2f})",
              file=sys.stderr)
        prev = ms
    results["fetch_roundtrip_ms"] = roundtrip * 1e3
    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
