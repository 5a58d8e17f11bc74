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


def test_iresnet_statedict_roundtrip(tmp_path):
    """ArcFace direction: torch iresnet -> flax -> export reproduces every
    key; non-features tensors exactly, the features BN functionally (the
    unfold normalizes to the gamma=1/beta=0 representative)."""
    from facerecognitionpipeline_tpu.models.onnx_import import (
        convert_iresnet_weights,
    )
    from facerecognitionpipeline_tpu.models.torch_export import (
        export_iresnet_statedict,
        save_iresnet_statedict,
    )
    from tests.test_onnx_import import _IResNetRef

    torch.manual_seed(3)
    ref = _IResNetRef()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.05)
                m.bias.normal_(0, 0.02)
    sd0 = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_iresnet_weights(sd0, "iresnet_18")
    sd1 = export_iresnet_statedict(variables, "iresnet_18")
    assert set(sd1) == set(sd0)
    for k in sd0:
        if k.startswith("features."):
            continue
        np.testing.assert_allclose(
            np.asarray(sd1[k], np.float64), sd0[k].astype(np.float64),
            atol=1e-6, err_msg=k,
        )
    # features BN functional equivalence: same normalization of any z
    z = np.random.default_rng(0).normal(size=(4, 512)).astype(np.float64)

    def apply_bn(sd):
        g, b = sd["features.weight"], sd["features.bias"]
        m, v = sd["features.running_mean"], sd["features.running_var"]
        return (z - m) / np.sqrt(np.asarray(v, np.float64) + 2e-5) * g + b

    np.testing.assert_allclose(apply_bn(sd1), apply_bn(sd0), atol=1e-5)

    # file-level: the .pt a stock arcface_torch/torch2onnx flow consumes
    path = str(tmp_path / "iresnet18.pt")
    save_iresnet_statedict(variables, "iresnet_18", path)
    blob = torch.load(path, map_location="cpu", weights_only=True)
    assert set(blob) == set(sd0)
    reimported = convert_iresnet_weights(
        {k: v.numpy() for k, v in blob.items()}, "iresnet_18"
    )
    a = jax_tree_allclose(variables, reimported)
    assert a, "statedict file round-trip changed the variable tree"


@pytest.mark.slow
def test_iresnet_export_torch_forward_matches(rng):
    """A flax-initialized iresnet backbone exports into the torch iresnet
    module (strict=True) and both eval forwards agree."""
    import jax

    from facerecognitionpipeline_tpu.models.torch_export import (
        export_iresnet_statedict,
    )
    from tests.test_onnx_import import _IResNetRef

    model = build_backbone("iresnet_18")
    variables = model.init(
        jax.random.PRNGKey(4), np.zeros((1, 112, 112, 3), np.float32)
    )
    stats = jax.tree.map(
        lambda a: a + 0.05 * np.arange(a.size, dtype=np.float32).reshape(a.shape)
        if a.ndim == 1 else a,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    sd = export_iresnet_statedict(variables, "iresnet_18")
    tmodel = _IResNetRef()
    tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    tmodel.eval()

    x = rng.uniform(-1, 1, size=(2, 112, 112, 3)).astype(np.float32)
    feat_j, norm_j = model.apply(variables, x)
    with torch.no_grad():
        z = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    feat_t = z / np.maximum(
        np.linalg.norm(z, axis=1, keepdims=True), 1e-12
    )
    np.testing.assert_allclose(np.asarray(feat_j), feat_t, atol=2e-5)


def test_iresnet_export_refuses_wrong_family(ref):
    """SE trees and subsampling-shortcut (AdaFace ir_*) trees must not export
    into iresnet naming — a strict torch load would fail on missing
    downsamples; fail early with a pointer to export_statedict."""
    from facerecognitionpipeline_tpu.models.torch_export import (
        export_iresnet_statedict,
    )

    sd0 = {k: v for k, v in ref.state_dict().items()}
    variables = convert_statedict(sd0, "ir_micro")
    with pytest.raises(ValueError, match="export_statedict"):
        export_iresnet_statedict(variables, "ir_micro")
    with pytest.raises(ValueError, match="SE"):
        export_iresnet_statedict(variables, "ir_se_50")


def jax_tree_allclose(a, b, atol=1e-6) -> bool:
    import jax

    leaves_a, treedef_a = jax.tree.flatten(a)
    leaves_b, treedef_b = jax.tree.flatten(b)
    if treedef_a != treedef_b:
        return False
    return all(
        np.allclose(np.asarray(x), np.asarray(y), atol=atol)
        for x, y in zip(leaves_a, leaves_b)
    )


def test_folded_tree_refused(ref):
    from facerecognitionpipeline_tpu.models.fold import fold_inference_variables

    variables = convert_statedict(
        {k: v for k, v in ref.state_dict().items()}, "ir_micro"
    )
    folded = fold_inference_variables(variables)
    with pytest.raises(ValueError, match="folded"):
        export_statedict(folded, "ir_micro")
