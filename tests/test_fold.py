"""BN-folding equivalence: folded inference backbone == standard backbone."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from facerecognitionpipeline_tpu.models.fold import fold_inference_variables
from facerecognitionpipeline_tpu.models.irse import IRBackbone, build_backbone


def _randomize_stats(variables, rng):
    """Give every BN non-trivial running stats/affines so the fold is
    actually exercised (fresh init has mean=0, var=1, scale=1, bias=0)."""

    def perturb(path, x):
        x = np.asarray(x)
        leaf = "/".join(str(p.key) for p in path)
        if x.dtype != np.float32 or "kernel" in leaf or "alpha" in leaf:
            return x
        if leaf.endswith("var"):
            return (0.3 + rng.uniform(0.0, 2.0, x.shape)).astype(np.float32)
        return rng.normal(0.0, 0.5, x.shape).astype(np.float32)

    return jax.tree_util.tree_map_with_path(perturb, variables)


@pytest.mark.parametrize(
    "units,use_se,conv_shortcut",
    [
        ((1, 1, 1, 1), False, False),
        ((1, 1, 1, 1), True, False),   # IR-SE blocks
        ((1, 1, 1, 1), False, True),   # iresnet conv shortcuts
    ],
)
def test_folded_matches_unfolded(units, use_se, conv_shortcut, rng):
    model = IRBackbone(units=units, use_se=use_se, conv_shortcut=conv_shortcut)
    x = jnp.asarray(rng.normal(size=(2, 112, 112, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = _randomize_stats(variables, rng)

    feat, norm = model.apply(variables, x)

    folded_model = IRBackbone(
        units=units, use_se=use_se, conv_shortcut=conv_shortcut, folded=True
    )
    folded_vars = fold_inference_variables(variables)
    ffeat, fnorm = folded_model.apply(folded_vars, x)

    np.testing.assert_allclose(np.asarray(ffeat), np.asarray(feat), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(fnorm), np.asarray(norm), rtol=1e-4, atol=1e-4
    )
    cos = np.sum(np.asarray(ffeat) * np.asarray(feat), axis=1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-6)


def test_folded_refuses_training():
    model = build_backbone("ir_micro", folded=True)
    x = jnp.zeros((1, 112, 112, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="inference-only"):
        model.apply(
            variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
        )


def test_folded_param_count_drops(rng):
    """Folding must not leave orphan params: folded init structure ==
    transformed structure (so flax apply matches names exactly)."""
    model = build_backbone("ir_micro")
    x = jnp.zeros((1, 112, 112, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    folded_vars = fold_inference_variables(variables)

    ref_struct = jax.tree_util.tree_structure(
        build_backbone("ir_micro", folded=True).init(jax.random.PRNGKey(0), x)
    )
    got_struct = jax.tree_util.tree_structure(folded_vars)
    assert ref_struct == got_struct
