"""Marginal attribution of the training step (VERDICT r3 #4).

The inference step got three redesigns off its marginal attribution
(PERFORMANCE.md "In-program marginal costs"); this applies the same
replace-with-dummy methodology to the 61%-MFU training step: measure the
FULL step, then variants with one stage removed or isolated, all on the
same fetch-verified chained-walls basis as bench.py. Variants:

* full          — fwd + bwd + DP/model reductions + optimizer + BN/EMA
                  bookkeeping (the shipped `Trainer.train_step`)
* no_opt        — value_and_grad only (optimizer + state rebuild removed):
                  the optimizer/apply_updates margin
* fwd_train     — loss value only, train-mode forward (bwd removed): the
                  backward-pass margin
* fwd_infer     — inference-mode forward of the backbone alone (no BN stat
                  mutation, no dropout, no classifier): BN/dropout-mode +
                  margin-head forward margin vs fwd_train
* dummy_head    — fwd+bwd with the class-sharded margin softmax replaced
                  by mean(feats^2) (backbone grads still flow): the
                  partial-FC + margin-head total (fwd+bwd) margin
* conv backward microbench — fwd vs fwd+bwd MFU of an isolated conv stack
  with ir_101-like shapes, to test whether the backward deficit is
  structural (transposed-conv/weight-grad layout) rather than anything in
  the trainer's own composition.

NOTE: the loss variants below deliberately RE-COMPOSE the trainer's loss
pieces standalone (no shard_map, no state plumbing) — that is what makes
them marginal probes. The FULL row uses the real `Trainer.train_step`, so
a drift between the trainer's loss and these probes shows up as margins
that stop adding up, not as silent staleness.

Run:  python examples/train_profile.py [batch] [arch]
"""

from __future__ import annotations

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
from facerecognitionpipeline_tpu.utils.compile_cache import (
    enable_compilation_cache,
)

CHAIN, SAMPLES = 5, 6


def measure(step_fn, sync, *args):
    """bench.py methodology: warm, roundtrip-probe, chained walls."""
    out = step_fn(*args)
    sync(out)
    out = step_fn(*args)
    sync(out)
    probes = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jnp.zeros(()))
        probes.append(time.perf_counter() - t0)
    rt = min(probes)
    walls = []
    for _ in range(SAMPLES):
        t0 = time.perf_counter()
        o = None
        for _ in range(CHAIN):
            o = step_fn(*args)
        sync(o)
        walls.append(time.perf_counter() - t0)
    ok = all(w > rt * 1.05 for w in walls)
    corr = rt if ok else 0.0
    times = np.array([(w - corr) / CHAIN for w in walls])
    return float(np.percentile(times, 50) * 1000), ok


def main() -> int:
    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    arch = sys.argv[2] if len(sys.argv) > 2 else "ir_101"

    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    cfg = TrainConfig(
        architecture=arch, num_classes=1024, loss="adaface",
        dtype=jnp.bfloat16,
    )
    trainer = Trainer(cfg, mesh)
    state = trainer.init_state(0)

    rng = np.random.default_rng(0)
    imgs = jax.device_put(jnp.asarray(
        rng.normal(0, 0.5, size=(batch, 112, 112, 3))
        .astype(np.float32).clip(-1, 1)
    ))
    labels = jax.device_put(jnp.asarray(
        rng.integers(0, cfg.num_classes, size=batch).astype(np.int32)
    ))
    key = jax.random.PRNGKey(0)

    results = {}

    # ---- full step
    def full(state):
        s, m = trainer.train_step(state, imgs, labels, key)
        return s

    def sync_state(s):
        np.asarray(s["step"])

    # keep state fixed (replay same step) — timing is value-independent
    results["full"], ok = measure(full, sync_state, state)

    # ---- variants built from the trainer's own loss_fn internals
    model = trainer.model
    params = state["params"]
    batch_stats = state["batch_stats"]
    norm_ema = state["norm_ema"]

    def loss_full(params, images):
        (feats, norms), mut = model.apply(
            {"params": params["backbone"], "batch_stats": batch_stats},
            images, train=True, rngs={"dropout": key},
            mutable=["batch_stats"],
        )
        norms = norms[:, 0]
        w = params["classifier"]
        w = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + 1e-8)
        cosine = jnp.dot(feats, w, preferred_element_type=jnp.float32)
        cos_t = jnp.take_along_axis(cosine, labels[:, None], axis=1)[:, 0]
        from facerecognitionpipeline_tpu.train.losses import (
            adaface_margin_cosine,
        )

        phi = adaface_margin_cosine(
            cos_t, norms, norm_ema["mean"], norm_ema["std"],
            cfg.margin, cfg.h,
        )
        onehot = jax.nn.one_hot(labels, cfg.num_classes, dtype=cosine.dtype)
        logits = cfg.scale * jnp.where(onehot > 0, phi[:, None], cosine)
        return jnp.mean(
            jax.nn.logsumexp(logits, axis=1)
            - jnp.sum(logits * onehot, axis=1)
        )

    def loss_dummy_head(params, images):
        (feats, norms), mut = model.apply(
            {"params": params["backbone"], "batch_stats": batch_stats},
            images, train=True, rngs={"dropout": key},
            mutable=["batch_stats"],
        )
        return jnp.mean(feats * feats)

    def sync_scalar(x):
        np.asarray(x)

    grad_full = jax.jit(jax.grad(loss_full))

    def sync_grads(g):
        leaf = jax.tree_util.tree_leaves(g)[0]
        np.asarray(leaf.ravel()[0])

    results["no_opt"], _ = measure(
        lambda: grad_full(params, imgs), sync_grads
    )

    fwd_train = jax.jit(loss_full)
    results["fwd_train"], _ = measure(
        lambda: fwd_train(params, imgs), sync_scalar
    )

    infer = jax.jit(
        lambda p, x: model.apply(
            {"params": p["backbone"], "batch_stats": batch_stats},
            x, train=False,
        )[0]
    )
    results["fwd_infer"], _ = measure(
        lambda: infer(params, imgs), lambda o: np.asarray(o.ravel()[0])
    )

    grad_dummy = jax.jit(jax.grad(loss_dummy_head))
    results["dummy_head"], _ = measure(
        lambda: grad_dummy(params, imgs), sync_grads
    )

    # ---- conv backward microbench: ir_101 stage-2-like shapes
    import flax.linen as nn

    class ConvStack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(8):
                x = nn.Conv(128, (3, 3), padding="SAME",
                            dtype=jnp.bfloat16, name=f"c{i}")(x)
            return x

    cs = ConvStack()
    cx = jnp.asarray(
        rng.normal(size=(batch, 28, 28, 128)).astype(np.float32)
    )
    cvars = cs.init(jax.random.PRNGKey(0), cx)
    conv_fwd = jax.jit(lambda v, x: jnp.sum(cs.apply(v, x) ** 2))
    conv_bwd = jax.jit(jax.grad(lambda v, x: jnp.sum(cs.apply(v, x) ** 2)))
    t_fwd, _ = measure(lambda: conv_fwd(cvars, cx), sync_scalar)
    t_bwd, _ = measure(lambda: conv_bwd(cvars, cx), sync_grads)
    conv_flops = 8 * 2 * batch * 28 * 28 * 9 * 128 * 128
    results["conv_microbench"] = {
        "fwd_ms": round(t_fwd, 2),
        "fwd_bwd_ms": round(t_bwd, 2),
        "fwd_tfs": round(conv_flops / t_fwd / 1e9, 1),
        "fwd_bwd_tfs": round(3 * conv_flops / t_bwd / 1e9, 1),
        "bwd_over_fwd": round((t_bwd - t_fwd) / (2 * t_fwd), 2),
    }

    # margins
    report = {
        "batch": batch,
        "arch": arch,
        "p50_ms": {k: (round(v, 2) if isinstance(v, float) else v)
                   for k, v in results.items()},
        "margins_ms": {
            "optimizer+state": round(results["full"] - results["no_opt"], 2),
            "backward": round(results["no_opt"] - results["fwd_train"], 2),
            "head_fwd_bwd": round(results["no_opt"] - results["dummy_head"], 2),
            "train_vs_infer_fwd": round(
                results["fwd_train"] - results["fwd_infer"], 2
            ),
        },
        "sync": "fetch-verified" if ok else "UNCORRECTED",
    }
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
