"""Sharded training-step tests on the virtual 8-device mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from facerecognitionpipeline_tpu.train.losses import (
    adaface_margin_cosine,
    arcface_margin_cosine,
    cosface_margin_cosine,
)
from facerecognitionpipeline_tpu.train.trainer import TrainConfig, Trainer


def test_margin_functions_penalize_target():
    cos_t = np.array([0.9, 0.5, -0.2], np.float32)
    for phi in (
        arcface_margin_cosine(cos_t, 0.5),
        cosface_margin_cosine(cos_t, 0.4),
        adaface_margin_cosine(
            cos_t, np.array([20.0, 25.0, 15.0], np.float32), 20.0, 10.0
        ),
    ):
        phi = np.asarray(phi)
        assert (phi < cos_t + 1e-6).all()  # a margin always makes it harder
        assert np.isfinite(phi).all()


def test_adaface_margin_quality_adaptive():
    # higher norm (quality) -> larger angular penalty at the same cosine
    cos_t = np.array([0.8, 0.8], np.float32)
    norms = np.array([35.0, 5.0], np.float32)
    phi = np.asarray(adaface_margin_cosine(cos_t, norms, 20.0, 10.0, m=0.4))
    assert phi[0] != phi[1]
    assert np.isfinite(phi).all()


@pytest.fixture(scope="module")
def mesh():
    dev = np.array(jax.devices()[:8]).reshape(4, 2)
    return Mesh(dev, axis_names=("data", "model"))


@pytest.mark.slow
def test_train_step_runs_and_learns(mesh, rng):
    cfg = TrainConfig(
        architecture="ir_micro", num_classes=64, loss="adaface", learning_rate=0.01
    )
    trainer = Trainer(cfg, mesh)
    state = trainer.init_state(0)

    images = rng.uniform(-1, 1, size=(8, 112, 112, 3)).astype(np.float32)
    labels = rng.integers(0, 64, size=(8,)).astype(np.int32)
    rng_key = jax.random.PRNGKey(0)

    state1, m1 = trainer.train_step(state, images, labels, rng_key)
    state2, m2 = trainer.train_step(state1, images, labels, rng_key)
    state3, m3 = trainer.train_step(state2, images, labels, rng_key)

    losses = [float(m["loss"]) for m in (m1, m2, m3)]
    assert all(np.isfinite(l) for l in losses)
    assert int(state3["step"]) == 3
    # same batch repeated: loss must decrease
    assert losses[2] < losses[0]
    # classifier stays sharded over the model axis
    spec = state3["params"]["classifier"].sharding.spec
    assert tuple(spec) == (None, "model")


def test_lr_schedules():
    """Schedule construction: warmup+cosine reaches peak then decays;
    step drops x0.1 at the scaled AdaFace milestones."""
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:2]).reshape(1, 2)
    mesh = Mesh(devices, axis_names=("data", "model"))
    cfg = TrainConfig(
        architecture="ir_micro", num_classes=64, learning_rate=0.1,
        lr_schedule="cosine", total_steps=100, warmup_steps=10,
    )
    sched = Trainer(cfg, mesh)._make_schedule()
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(10)) == pytest.approx(0.1, rel=1e-3)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-6)

    cfg = TrainConfig(
        architecture="ir_micro", num_classes=64, learning_rate=0.1,
        lr_schedule="step", total_steps=100,
    )
    sched = Trainer(cfg, mesh)._make_schedule()
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(61)) == pytest.approx(0.01, rel=1e-3)
    assert float(sched(81)) == pytest.approx(0.001, rel=1e-3)
    assert float(sched(91)) == pytest.approx(0.0001, rel=1e-3)

    with pytest.raises(ValueError):
        Trainer(
            TrainConfig(architecture="ir_micro", num_classes=64,
                        lr_schedule="nope"),
            mesh,
        )


@pytest.mark.parametrize("loss", ["arcface", "cosface"])
def test_train_step_other_losses(mesh, loss, rng):
    cfg = TrainConfig(
        architecture="ir_micro", num_classes=64, loss=loss, learning_rate=0.01
    )
    trainer = Trainer(cfg, mesh)
    state = trainer.init_state(0)
    images = rng.uniform(-1, 1, size=(8, 112, 112, 3)).astype(np.float32)
    labels = rng.integers(0, 64, size=(8,)).astype(np.int32)
    _, m = trainer.train_step(state, images, labels, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_class_sharded_loss_matches_unsharded(rng):
    """The partial-FC sharded softmax must equal the dense computation.

    Same data-axis size (so per-shard batches and dropout folds match), model
    axis 2 vs 1: loss values and the classifier update must agree.
    """
    cfg = TrainConfig(architecture="ir_micro", num_classes=64, learning_rate=0.1)
    devices = np.array(jax.devices()[:8])
    mesh_tp = Mesh(devices.reshape(4, 2), axis_names=("data", "model"))
    mesh_dp = Mesh(devices[:4].reshape(4, 1), axis_names=("data", "model"))

    images = rng.uniform(-1, 1, size=(8, 112, 112, 3)).astype(np.float32)
    labels = rng.integers(0, 64, size=(8,)).astype(np.int32)

    results = {}
    for name, mesh in (("tp", mesh_tp), ("dp", mesh_dp)):
        trainer = Trainer(cfg, mesh)
        state = trainer.init_state(0)
        s1, m = trainer.train_step(state, images, labels, jax.random.PRNGKey(1))
        results[name] = (float(m["loss"]), np.asarray(s1["params"]["classifier"]))

    assert results["tp"][0] == pytest.approx(results["dp"][0], rel=1e-4)
    np.testing.assert_allclose(
        results["tp"][1], results["dp"][1], rtol=1e-3, atol=1e-5
    )


def test_fused_optimizer_matches_optax(mesh, rng):
    """The fused one-pass SGD update (r4, _fused_sgd_apply) must produce
    the same trajectory as the optax chain it replaces — same params and
    momentum after several steps on the same data (f32 tolerance: the two
    walks reassociate the same arithmetic)."""
    images = rng.uniform(-1, 1, size=(8, 112, 112, 3)).astype(np.float32)
    labels = rng.integers(0, 64, size=(8,)).astype(np.int32)
    key = jax.random.PRNGKey(0)

    states = {}
    for fused in (True, False):
        cfg = TrainConfig(
            architecture="ir_micro", num_classes=64, loss="adaface",
            learning_rate=0.05, lr_schedule="step", total_steps=10,
            warmup_steps=2, fused_optimizer=fused,
        )
        trainer = Trainer(cfg, mesh)
        state = trainer.init_state(0)
        for _ in range(3):
            state, _ = trainer.train_step(state, images, labels, key)
        states[fused] = state

    pf = jax.tree_util.tree_leaves(states[True]["params"])
    po = jax.tree_util.tree_leaves(states[False]["params"])
    for a, b in zip(pf, po):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-5, atol=2e-6,
        )
    # fused opt_state carries the momentum trace + schedule count
    assert int(states[True]["opt_state"]["count"]) == 3
    tr = states[True]["opt_state"]["trace"]["classifier"]
    assert tuple(tr.sharding.spec) == (None, "model")  # slots shard too
