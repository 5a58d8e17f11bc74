"""Int8-forward training probe: does int8 fwd move training throughput?

VERDICT r4 #6: PERFORMANCE.md names precision as the remaining training
lever; this is the measured experiment. The probe trains with the res convs
running s8 x s8 -> s32 on the MXU in the FORWARD pass (dynamic per-tensor
activation / per-channel weight scales, models/irse.py::int8_fwd_conv) and
exact float conv VJPs in the backward (straight-through estimator), and
compares against the standard bf16 step:

* device step time over chained fetch-verified windows (bench.py
  methodology; the SAME device-resident batch every step, so the tunnel's
  H2D link is out of the measurement);
* convergence sanity: loss trajectories over N steps on identical data.

Expectation math (from the r4 bisect, reports/train_profile): backward is
2.4x forward, so even a perfect 2x on forward conv FLOPs bounds the win at
~14% of the step — minus the dynamic-amax reductions and q/dq elementwise
this probe adds. The point is to MEASURE where it lands and record the
verdict in PERFORMANCE.md.

Run: PYTHONPATH=. python examples/train_int8_probe.py [--arch ir_18]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from facerecognitionpipeline_tpu.parallel.mesh import make_mesh
from facerecognitionpipeline_tpu.train.trainer import TrainConfig, Trainer


def measure(trainer, state, images, labels, key, chain=5, samples=6):
    """Chained fetch-verified step timing (memory: block_until_ready does
    not reliably sync through the axon tunnel)."""
    def sync(s, m):
        np.asarray(m["loss"])

    st, m = trainer.train_step(state, images, labels, key)
    sync(st, m)  # compile
    st, m = trainer.train_step(st, images, labels, key)
    sync(st, m)
    probes = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jnp.zeros(()))
        probes.append(time.perf_counter() - t0)
    rt = min(probes)
    walls = []
    for _ in range(samples):
        t0 = time.perf_counter()
        for _ in range(chain):
            st, m = trainer.train_step(st, images, labels, key)
        sync(st, m)
        walls.append(time.perf_counter() - t0)
    ok = all(w > rt * 1.05 for w in walls)
    corr = rt if ok else 0.0
    times = np.array([(w - corr) / chain for w in walls])
    return float(np.percentile(times, 50) * 1000), ok, st


def converge(trainer, state, batches, key, steps):
    losses = []
    for i in range(steps):
        x, y = batches[i % len(batches)]
        state, m = trainer.train_step(state, x, y, key)
        if (i + 1) % 25 == 0:
            losses.append(round(float(m["loss"]), 4))
    return losses


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="ir_18")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--classes", type=int, default=256)
    ap.add_argument("--converge_steps", type=int, default=200)
    ap.add_argument("--out", default="reports/train_profile/int8_probe.json")
    args = ap.parse_args()

    from facerecognitionpipeline_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.uniform(-1, 1, size=(args.batch, 112, 112, 3)).astype(np.float32)
    )
    labels = jax.device_put(
        rng.integers(0, args.classes, size=(args.batch,)).astype(np.int32)
    )
    key = jax.random.PRNGKey(0)

    report = {"arch": args.arch, "batch": args.batch}
    for name, int8 in (("bf16", False), ("int8_fwd", True)):
        cfg = TrainConfig(
            architecture=args.arch, num_classes=args.classes,
            loss="adaface", learning_rate=0.05, dtype=jnp.bfloat16,
            int8_forward=int8,
        )
        trainer = Trainer(cfg, mesh)
        state = trainer.init_state(0)
        p50, ok, state = measure(trainer, state, images, labels, key)
        # convergence sanity on a few distinct device batches
        batches = []
        for i in range(4):
            batches.append((
                jax.device_put(rng.uniform(
                    -1, 1, size=(args.batch, 112, 112, 3)
                ).astype(np.float32)),
                jax.device_put(rng.integers(
                    0, args.classes, size=(args.batch,)
                ).astype(np.int32)),
            ))
        losses = converge(trainer, trainer.init_state(1), batches, key,
                          args.converge_steps)
        report[name] = {
            "p50_step_ms": round(p50, 2),
            "imgs_per_sec": round(args.batch / (p50 / 1000), 1),
            "sync_ok": ok,
            "loss_every_25": losses,
        }
        print(f"{name}: p50 {p50:.2f} ms/step "
              f"({args.batch / (p50 / 1000):.0f} imgs/s) "
              f"loss {losses[:3]} ... {losses[-2:]}", flush=True)

    a, b = report["bf16"]["p50_step_ms"], report["int8_fwd"]["p50_step_ms"]
    report["speedup_int8_fwd"] = round(a / b, 3)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("arch", "batch", "speedup_int8_fwd")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
