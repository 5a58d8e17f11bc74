"""Reverse checkpoint export: flax variables -> AdaFace-zoo torch layout.

`models.torch_export` is the inverse of `models.torch_import` — weights
trained/imported in this framework must deploy back into the reference
stack (`face_embedder.py:49-53` loading semantics). Pinned here:

* exact statedict round-trip (torch -> flax -> torch, every key/value);
* a real torch module loads the export with strict=True and its eval
  forward matches the flax forward;
* file-level .ckpt round-trip through save/load;
* the BN-folded inference tree is refused (its stats are gone).
"""

import numpy as np
import pytest
import torch

from facerecognitionpipeline_tpu.models.irse import build_backbone
from facerecognitionpipeline_tpu.models.torch_export import (
    export_statedict,
    save_adaface_checkpoint,
)
from facerecognitionpipeline_tpu.models.torch_import import (
    convert_statedict,
    load_adaface_checkpoint,
)
from tests.torch_ref import make_reference


@pytest.fixture(scope="module")
def ref():
    return make_reference((1, 1, 1, 1), use_se=False, seed=5)


def test_statedict_roundtrip_exact(ref):
    sd0 = {k: v for k, v in ref.state_dict().items()}
    variables = convert_statedict(sd0, "ir_micro")
    sd1 = export_statedict(variables, "ir_micro")
    assert set(sd1) == set(sd0)
    for k in sd0:
        np.testing.assert_allclose(
            np.asarray(sd1[k], np.float64),
            sd0[k].numpy().astype(np.float64),
            atol=1e-6, err_msg=k,
        )


def test_torch_loads_export_strict_and_forward_matches(rng):
    """A flax-initialized backbone exports into a torch module (strict=True)
    and both forwards agree — the deploy-back direction actually runs."""
    import jax

    model = build_backbone("ir_micro")
    variables = model.init(
        jax.random.PRNGKey(2), np.zeros((1, 112, 112, 3), np.float32)
    )
    # non-trivial BN stats so the test can't pass by ignoring them
    stats = jax.tree.map(
        lambda a: a + 0.05 * np.arange(a.size, dtype=np.float32).reshape(a.shape)
        if a.ndim == 1 else a,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    sd = export_statedict(variables, "ir_micro")
    tmodel = make_reference((1, 1, 1, 1), use_se=False, seed=0)
    tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    tmodel.eval()

    x = rng.uniform(-1, 1, size=(2, 112, 112, 3)).astype(np.float32)
    feat_j, norm_j = model.apply(variables, x)
    with torch.no_grad():
        feat_t, norm_t = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(feat_j), feat_t.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(norm_j).ravel(), norm_t.numpy().ravel(), rtol=1e-4
    )


def test_ckpt_file_roundtrip(tmp_path, ref, rng):
    sd0 = {k: v for k, v in ref.state_dict().items()}
    variables = convert_statedict(sd0, "ir_micro")
    path = str(tmp_path / "exported.ckpt")
    save_adaface_checkpoint(variables, "ir_micro", path)

    # the reference's own loading semantics: state_dict + 'model.' prefix
    blob = torch.load(path, map_location="cpu", weights_only=True)
    assert all(k.startswith("model.") for k in blob["state_dict"])
    reimported = load_adaface_checkpoint(path, "ir_micro")

    x = rng.uniform(-1, 1, size=(1, 112, 112, 3)).astype(np.float32)
    model = build_backbone("ir_micro")
    a, _ = model.apply(variables, x)
    b, _ = model.apply(reimported, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_se_variant_roundtrip(rng):
    ref = make_reference((1, 1, 1, 1), use_se=True, seed=7)
    sd0 = {k: v for k, v in ref.state_dict().items()}
    # ir_micro has no SE config entry; register a scratch one and clean up
    # so detect_architecture's arch iteration is unaffected elsewhere
    from facerecognitionpipeline_tpu.models.irse import BACKBONE_CONFIGS

    BACKBONE_CONFIGS["ir_micro_se"] = {"units": (1, 1, 1, 1), "use_se": True}
    try:
        variables = convert_statedict(sd0, "ir_micro_se")
        sd1 = export_statedict(variables, "ir_micro_se")
    finally:
        BACKBONE_CONFIGS.pop("ir_micro_se", None)
    assert set(sd1) == set(sd0)
    for k in sd0:
        np.testing.assert_allclose(
            np.asarray(sd1[k], np.float64), sd0[k].numpy(), atol=1e-6,
            err_msg=k,
        )


def test_folded_tree_refused(ref):
    from facerecognitionpipeline_tpu.models.fold import fold_inference_variables

    variables = convert_statedict(
        {k: v for k, v in ref.state_dict().items()}, "ir_micro"
    )
    folded = fold_inference_variables(variables)
    with pytest.raises(ValueError, match="folded"):
        export_statedict(folded, "ir_micro")
