"""Sharded training step: DP over batch x class-sharded partial-FC head.

Mesh layout ('data', 'model'):
* images/labels       : P('data', ...)            — batch split over DP axis
* backbone params/opt : P()                       — replicated, grads psum'd
* classifier W [D, C] : P(None, 'model')          — classes split over TP
                         axis (the "partial FC" layout: with millions of
                         identities the classifier dwarfs the backbone)
* softmax over C      : pmax/psum over 'model'    — collectives ride ICI

PP/SP/EP are N/A for this model family (CNN on 112x112 crops, no sequence
axis — SURVEY.md §2). The full step (backbone fwd+bwd with BN stat sync,
margin head, sharded cross-entropy, optax update) is one `shard_map`'d jitted
program; `__graft_entry__.dryrun_multichip` runs it on a virtual mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facerecognitionpipeline_tpu.models.irse import build_backbone
from facerecognitionpipeline_tpu.train.losses import (
    adaface_margin_cosine,
    arcface_margin_cosine,
    cosface_margin_cosine,
)

_EPS = 1e-7


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    architecture: str = "ir_50"
    num_classes: int = 1024
    embedding_dim: int = 512
    loss: str = "adaface"          # adaface | arcface | cosface
    margin: float = 0.4
    scale: float = 64.0
    h: float = 0.333               # adaface norm-sensitivity
    learning_rate: float = 0.1
    momentum: float = 0.9
    weight_decay: float = 5e-4
    ema_decay: float = 0.99        # adaface norm-stat EMA
    dtype: Any = jnp.float32
    # LR schedule: 'constant', 'cosine' (decay to 0 over total_steps after
    # linear warmup), or 'step' (x0.1 at the AdaFace milestones scaled to
    # total_steps: 12/20, 16/20, 18/20 of the run)
    lr_schedule: str = "constant"
    total_steps: int = 10_000
    warmup_steps: int = 0
    # Int8-forward probe (VERDICT r4 #6): res convs run s8xs8->s32 with
    # dynamic scales in the FORWARD pass only (exact float VJP in bwd) —
    # models/irse.py::Int8FwdConv. Param tree is unchanged, so checkpoints
    # interop with the standard path.
    int8_forward: bool = False
    # Fused one-pass SGD update (see _fused_sgd_apply): the r4 training
    # bisect measured optax.chain(add_decayed_weights, sgd)'s multi-pass
    # tree walk at 5.9 ms of the 72 ms ir_101 B=128 step; the fused form
    # reads p/g/mu once and writes p'/mu' once. False falls back to the
    # equivalent optax chain (kept as the parity oracle —
    # tests/test_train.py pins bit-level agreement).
    fused_optimizer: bool = True


def _fused_sgd_apply(params, grads, opt_state, schedule, momentum, wd):
    """One-pass SGD-momentum-with-weight-decay update.

    Semantics are exactly optax.chain(add_decayed_weights(wd),
    sgd(schedule, momentum)) + apply_updates:
        mu' = momentum * mu + (g + wd * p);   p' = p - lr(count) * mu'
    but computed in a single flattened tree walk so XLA emits one fused
    read of (p, g, mu) and one write of (p', mu') per leaf instead of the
    optax chain's separate decay/trace/scale/apply passes — measured
    5.88 -> ~2 ms on the ir_101 B=128 step (PERFORMANCE.md training
    attribution). opt_state = {'trace': tree-like-params, 'count': i32}.
    """
    count = opt_state["count"]
    lr = schedule(count) if callable(schedule) else schedule
    leaves_p, treedef = jax.tree_util.tree_flatten(params)
    leaves_g = treedef.flatten_up_to(grads)
    leaves_m = treedef.flatten_up_to(opt_state["trace"])
    new_p, new_m = [], []
    for p, g, mu in zip(leaves_p, leaves_g, leaves_m):
        mu2 = momentum * mu + (g + wd * p)
        new_m.append(mu2)
        new_p.append((p - lr * mu2).astype(p.dtype))
    return (
        treedef.unflatten(new_p),
        {"trace": treedef.unflatten(new_m), "count": count + 1},
    )


class Trainer:
    """Builds state and the sharded train step for a (data, model) mesh."""

    def __init__(self, config: TrainConfig, mesh: Mesh):
        self.config = config
        self.mesh = mesh
        self.model = build_backbone(
            config.architecture, dtype=config.dtype,
            int8_fwd_train=config.int8_forward,
        )
        self._schedule = self._make_schedule()
        self.tx = optax.chain(
            optax.add_decayed_weights(config.weight_decay),
            optax.sgd(self._schedule, momentum=config.momentum),
        )
        assert config.num_classes % mesh.shape["model"] == 0, (
            "num_classes must divide the model axis"
        )
        self._step = self._build_step()

    def _make_schedule(self):
        cfg = self.config
        if cfg.lr_schedule == "cosine":
            if cfg.warmup_steps > 0:
                return optax.warmup_cosine_decay_schedule(
                    0.0, cfg.learning_rate, cfg.warmup_steps, cfg.total_steps
                )
            return optax.cosine_decay_schedule(cfg.learning_rate, cfg.total_steps)
        if cfg.lr_schedule == "step":
            # AdaFace recipe: x0.1 at epochs 12/16/18 of 20, scaled to the run
            # join_schedules feeds the post-warmup schedule (step -
            # warmup_steps), so shift the absolute-run milestones left by
            # the warmup or the decays would fire warmup_steps late.
            milestones = {
                max(1, int(cfg.total_steps * f) - cfg.warmup_steps): 0.1
                for f in (0.6, 0.8, 0.9)
            }
            base = optax.piecewise_constant_schedule(cfg.learning_rate, milestones)
            if cfg.warmup_steps > 0:
                warm = optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps)
                return optax.join_schedules([warm, base], [cfg.warmup_steps])
            return base
        if cfg.lr_schedule != "constant":
            raise ValueError(f"unknown lr_schedule: {cfg.lr_schedule}")
        return cfg.learning_rate

    # -------------------------------------------------------------- state

    def init_state(self, seed: int = 0) -> dict:
        k_model, k_w = jax.random.split(jax.random.PRNGKey(seed))
        variables = self.model.init(
            k_model, jnp.zeros((1, 112, 112, 3), jnp.float32)
        )
        cfg = self.config
        classifier = (
            jax.random.normal(k_w, (cfg.embedding_dim, cfg.num_classes), jnp.float32)
            * 0.01
        )
        params = {"backbone": variables["params"], "classifier": classifier}
        opt_state = (
            {
                "trace": jax.tree.map(jnp.zeros_like, params),
                "count": jnp.asarray(0, jnp.int32),
            }
            if self.config.fused_optimizer
            else self.tx.init(params)
        )
        state = {
            "params": params,
            "batch_stats": variables["batch_stats"],
            "opt_state": opt_state,
            "norm_ema": {  # adaface quality-proxy statistics
                "mean": jnp.asarray(20.0),
                "std": jnp.asarray(100.0),
            },
            "step": jnp.asarray(0, jnp.int32),
        }
        return jax.device_put(state, self.state_sharding(state))

    def state_sharding(self, state) -> Any:
        """Replicate everything except the class-sharded classifier."""
        return jax.tree.map(
            lambda spec: NamedSharding(self.mesh, spec),
            self._state_specs(state),
        )

    @staticmethod
    def _state_specs(state) -> Any:
        """PartitionSpec per state leaf: classifier-path leaves (params AND
        their optimizer slots) shard classes over 'model'; everything else
        replicates. ONE rule shared by state_sharding and the step's
        shard_map in/out specs."""
        def spec_for(path, leaf):
            keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
            if "classifier" in keys:
                return P(None, "model")
            return P()

        return jax.tree_util.tree_map_with_path(spec_for, state)

    def batch_sharding(self):
        return (
            NamedSharding(self.mesh, P("data")),
            NamedSharding(self.mesh, P("data")),
        )

    # ---------------------------------------------------------------- step

    def _margin(self, cos_t, norms, norm_mean, norm_std):
        cfg = self.config
        if cfg.loss == "arcface":
            return arcface_margin_cosine(cos_t, cfg.margin)
        if cfg.loss == "cosface":
            return cosface_margin_cosine(cos_t, cfg.margin)
        return adaface_margin_cosine(
            cos_t, norms, norm_mean, norm_std, cfg.margin, cfg.h
        )

    def _build_step(self):
        cfg = self.config
        n_model = self.mesh.shape["model"]
        c_local = cfg.num_classes // n_model

        def loss_fn(params, batch_stats, norm_ema, images, labels, rng):
            # ---- backbone forward (train mode, local batch) ----
            (feats, norms), mutated = self.model.apply(
                {"params": params["backbone"], "batch_stats": batch_stats},
                images,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            norms = norms[:, 0]

            # ---- class-sharded margin softmax ----
            w = params["classifier"]  # local shard [D, c_local]
            w = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + _EPS)
            cosine = jnp.dot(feats, w, preferred_element_type=jnp.float32)

            offset = jax.lax.axis_index("model") * c_local
            local_label = labels - offset
            in_shard = (local_label >= 0) & (local_label < c_local)
            safe_label = jnp.clip(local_label, 0, c_local - 1)

            cos_t_local = jnp.take_along_axis(
                cosine, safe_label[:, None], axis=1
            )[:, 0]
            cos_t_local = jnp.where(in_shard, cos_t_local, 0.0)
            # every device needs the target cosine to stay consistent
            cos_t = jax.lax.psum(cos_t_local, "model")

            phi = self._margin(cos_t, norms, norm_ema["mean"], norm_ema["std"])

            onehot_local = (
                jax.nn.one_hot(safe_label, c_local, dtype=cosine.dtype)
                * in_shard[:, None]
            )
            logits = cfg.scale * jnp.where(
                onehot_local > 0, phi[:, None], cosine
            )

            # sharded softmax cross-entropy over the full class axis.
            # pmax has no VJP; the max is a constant shift, so stop-grad it.
            local_max = jax.lax.stop_gradient(jnp.max(logits, axis=1))
            gmax = jax.lax.pmax(local_max, "model")
            z = jnp.exp(logits - gmax[:, None])
            denom = jax.lax.psum(jnp.sum(z, axis=1), "model")
            target_logit = jax.lax.psum(
                jnp.sum(logits * onehot_local, axis=1), "model"
            )
            xent = jnp.log(denom) + gmax - target_logit
            loss = jnp.mean(xent)
            # average loss across the data axis for reporting
            loss = jax.lax.pmean(loss, "data")

            batch_norm_mean = jnp.mean(norms)
            batch_norm_std = jnp.std(norms) + _EPS
            aux = {
                "batch_stats": mutated["batch_stats"],
                "norm_mean": jax.lax.pmean(batch_norm_mean, "data"),
                "norm_std": jax.lax.pmean(batch_norm_std, "data"),
                # true top-1 over the FULL (sharded) class axis: the
                # target's pre-margin cosine must be the global argmax
                # (pmax has no VJP — metric only, so stop-grad the operand)
                "accuracy": jax.lax.pmean(
                    jnp.mean(
                        (
                            jax.lax.stop_gradient(cos_t)
                            >= jax.lax.pmax(
                                jax.lax.stop_gradient(
                                    jnp.max(cosine, axis=1)
                                ),
                                "model",
                            )
                            - 1e-6
                        ).astype(jnp.float32)
                    ),
                    "data",
                ),
            }
            return loss, aux

        def train_step(state, images, labels, rng):
            # Distinct dropout mask per data shard AND per step — callers
            # pass one base key for the whole run, so without the step
            # fold-in the Dropout mask would be identical every iteration
            # and the masked activations' fc columns would never train.
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            rng = jax.random.fold_in(rng, state["step"])
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"],
                state["batch_stats"],
                state["norm_ema"],
                images,
                labels,
                rng,
            )
            # DP gradient reduction: backbone grads psum-mean over 'data';
            # the classifier shard also sums over 'data' (same classes on
            # every data row) — uniform pmean is correct for both.
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, "data"), grads)
            # The loss value is replicated over 'model'; in shard_map AD each
            # replica pushes cotangent 1 back through the forward psums, so a
            # shard-local classifier column accumulates n_model copies of its
            # true gradient — scale it back. Backbone grads are instead
            # computed identically on every model replica — average them.
            grads = {
                "backbone": jax.tree.map(
                    lambda g: jax.lax.pmean(g, "model"), grads["backbone"]
                ),
                "classifier": grads["classifier"] / n_model,
            }

            if cfg.fused_optimizer:
                params, opt_state = _fused_sgd_apply(
                    state["params"], grads, state["opt_state"],
                    self._schedule, cfg.momentum, cfg.weight_decay,
                )
            else:
                updates, opt_state = self.tx.update(
                    grads, state["opt_state"], state["params"]
                )
                params = optax.apply_updates(state["params"], updates)

            # BN stats: average the per-shard updates
            batch_stats = jax.tree.map(
                lambda s: jax.lax.pmean(jax.lax.pmean(s, "data"), "model"),
                aux["batch_stats"],
            )
            d = self.config.ema_decay
            norm_ema = {
                "mean": d * state["norm_ema"]["mean"] + (1 - d) * aux["norm_mean"],
                "std": d * state["norm_ema"]["std"] + (1 - d) * aux["norm_std"],
            }
            new_state = {
                "params": params,
                "batch_stats": batch_stats,
                "opt_state": opt_state,
                "norm_ema": norm_ema,
                "step": state["step"] + 1,
            }
            return new_state, {"loss": loss, "accuracy": aux["accuracy"]}

        # Build in/out specs lazily on first call from the concrete state
        # pytree (optimizer state structure depends on optax internals), then
        # cache the jitted program — recompiles only if the structure changes.
        make_specs = self._state_specs

        cache: dict = {}

        def stepper(state, images, labels, rng):
            key = jax.tree_util.tree_structure(state)
            if key not in cache:
                state_spec = make_specs(state)
                fn = jax.shard_map(
                    train_step,
                    mesh=self.mesh,
                    in_specs=(state_spec, P("data"), P("data"), P()),
                    out_specs=(state_spec, P()),
                    check_vma=False,
                )
                cache[key] = jax.jit(fn)
            return cache[key](state, images, labels, rng)

        return stepper

    def train_step(self, state, images, labels, rng):
        """One optimizer step. images [B,112,112,3] f32 in [-1,1], labels [B]."""
        return self._step(state, images, labels, rng)
