"""Backbone shape/invariant tests + numerical parity vs a torch reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from facerecognitionpipeline_tpu.models.irse import build_backbone
from facerecognitionpipeline_tpu.models.torch_import import (
    convert_statedict,
    detect_architecture,
    strip_prefix,
)


def test_forward_shapes_and_norm(rng):
    model = build_backbone("ir_18")
    x = jnp.asarray(rng.normal(size=(2, 112, 112, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    feat, norm = model.apply(variables, x)
    assert feat.shape == (2, 512)
    assert norm.shape == (2, 1)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(feat), axis=1), 1.0, rtol=1e-5
    )


@pytest.mark.parametrize("arch,units,use_se", [
    ("ir_18", (2, 2, 2, 2), False),
    ("ir_se_50", (3, 4, 14, 3), True),
])
def test_parity_with_torch_reference(arch, units, use_se, rng):
    """Import a torch statedict and require near-bit-identical embeddings."""
    import torch

    from tests.torch_ref import make_reference

    ref = make_reference(units, use_se=use_se, seed=3)
    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}

    assert detect_architecture(strip_prefix(sd)) == arch
    variables = convert_statedict(strip_prefix(sd), arch)

    model = build_backbone(arch)
    img = rng.uniform(-1, 1, size=(3, 112, 112, 3)).astype(np.float32)

    feat, norm = model.apply(variables, jnp.asarray(img))

    with torch.no_grad():
        tfeat, tnorm = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)))

    np.testing.assert_allclose(
        np.asarray(feat), tfeat.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(norm), tnorm.numpy(), atol=2e-2, rtol=1e-3
    )
    # Match decisions depend on cosine similarity: require it tighter still.
    cos = np.sum(np.asarray(feat) * tfeat.numpy(), axis=1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-6)


def test_train_mode_runs_and_updates_stats(rng):
    model = build_backbone("ir_18")
    x = jnp.asarray(rng.normal(size=(2, 112, 112, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    (feat, _), mutated = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert feat.shape == (2, 512)
    before = variables["batch_stats"]["input_bn"]["mean"]
    after = mutated["batch_stats"]["input_bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
