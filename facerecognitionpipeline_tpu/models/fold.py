"""Fold inference-mode BatchNorm into conv/fc weights for the IR backbones.

At inference a BatchNorm is the per-channel affine y = g*x + b with
g = scale/sqrt(var+eps), b = bias - mean*g. Every BN in the IR/IR-SE
architecture sits next to a matmul-family op, so the whole normalization
cost can be baked into weights ahead of time (exact, up to float rounding):

* post-conv BNs (`input_bn`, `res_bn2`, `res_bn3`, `shortcut_bn`):
  kernel' = kernel * g over the output-channel axis, bias' = b;
* the pre-conv `res_bn1` CANNOT be folded into `res_conv1` exactly (the
  conv zero-pads its input, and folding the shift into a bias would apply
  it to the padding ring too) — it survives as a bare `Affine`;
* the output tail `output_bn -> flatten -> fc -> output_feature_bn`
  collapses into the single Dense: the pre-fc channel affine scales the
  Dense kernel rows (channel-major flatten order), the post-fc whitening
  (affine-free BN1d) scales its columns.

This removes ~2/3 of the BN element-wise passes from the hot embed stage
(PERFORMANCE.md attributes the residual off-MFU time to the BN/PReLU VPU
tail). The reference runs torch BN layers at inference unconditionally
(`face_embedder.py:112-135` forward semantics are preserved bit-for-bit
minus rounding).

Use `irse.build_backbone(arch, folded=True)` with the variables returned
by `fold_inference_variables`.
"""

from __future__ import annotations

import jax
import numpy as np

_EPS = 1e-5  # matches every BatchNorm epsilon in irse.py


def _f64(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float64)


def _bn_affine(bn_params: dict, bn_stats: dict) -> tuple[np.ndarray, np.ndarray]:
    """(g, b) such that BN(x) == g*x + b at inference."""
    g = _f64(bn_params["scale"]) / np.sqrt(_f64(bn_stats["var"]) + _EPS)
    b = _f64(bn_params["bias"]) - _f64(bn_stats["mean"]) * g
    return g, b


def _fold_conv(conv_params: dict, bn_params: dict, bn_stats: dict) -> dict:
    """Conv(no bias) -> BN  ==>  Conv(kernel*g, bias=b)."""
    g, b = _bn_affine(bn_params, bn_stats)
    kernel = _f64(conv_params["kernel"]) * g  # HWIO * [out]
    return {
        "kernel": kernel.astype(np.float32),
        "bias": b.astype(np.float32),
    }


def _copy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def fold_inference_variables(variables: dict, input_size: int = 112) -> dict:
    """Rewrite trained/imported IRBackbone variables into the folded form.

    Input: {'params': ..., 'batch_stats': ...} from the standard backbone.
    Output: {'params': ...} for `build_backbone(arch, folded=True)`.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    out: dict = {}

    out["input_conv"] = _fold_conv(
        params["input_conv"], params["input_bn"], stats["input_bn"]
    )
    out["input_prelu"] = _copy(params["input_prelu"])

    for name, p in params.items():
        if not name.startswith("stage"):
            continue
        s = stats[name]
        g1, b1 = _bn_affine(p["res_bn1"], s["res_bn1"])
        blk = {
            "res_affine": {
                "scale": g1.astype(np.float32),
                "shift": b1.astype(np.float32),
            },
            "res_conv1": _fold_conv(p["res_conv1"], p["res_bn2"], s["res_bn2"]),
            "res_prelu": _copy(p["res_prelu"]),
            "res_conv2": _fold_conv(p["res_conv2"], p["res_bn3"], s["res_bn3"]),
        }
        if "shortcut_conv" in p:
            blk["shortcut_conv"] = _fold_conv(
                p["shortcut_conv"], p["shortcut_bn"], s["shortcut_bn"]
            )
        if "se" in p:
            blk["se"] = _copy(p["se"])
        out[name] = blk

    # Tail: output_bn (channel affine, pre-flatten) and output_feature_bn
    # (mean/var whitening, post-fc) both bake into the Dense.
    kernel = _f64(params["output_fc"]["kernel"])  # [C*H*W, 512]
    bias = _f64(params["output_fc"]["bias"])
    g, b = _bn_affine(params["output_bn"], stats["output_bn"])
    hw = (input_size // 16) ** 2
    if kernel.shape[0] != g.shape[0] * hw:
        raise ValueError(
            f"output_fc kernel rows {kernel.shape[0]} != "
            f"{g.shape[0]} channels x {hw} spatial — wrong input_size?"
        )
    # flatten is channel-major ([B,C,H,W] -> [B, C*H*W]), so each channel's
    # affine repeats over its hw contiguous rows.
    g_rep = np.repeat(g, hw)
    b_rep = np.repeat(b, hw)
    bias = bias + b_rep @ kernel
    kernel = kernel * g_rep[:, None]
    fstats = stats["output_feature_bn"]
    inv_std = 1.0 / np.sqrt(_f64(fstats["var"]) + _EPS)
    kernel = kernel * inv_std[None, :]
    bias = (bias - _f64(fstats["mean"])) * inv_std
    out["output_fc"] = {
        "kernel": kernel.astype(np.float32),
        "bias": bias.astype(np.float32),
    }

    return {"params": out}
