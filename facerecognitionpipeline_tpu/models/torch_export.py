"""Export flax IR/IR-SE variables to the AdaFace-zoo PyTorch layout.

The exact inverse of `models.torch_import.convert_statedict`: a backbone
trained (or imported) in this framework round-trips into the torch
Sequential naming the reference consumes (`net.build_model(arch)` +
`model.`-prefixed Lightning statedict, reference `face_embedder.py:49-53`),
so identities enrolled here can be served by the original stack and
framework-trained weights deploy either way.

Conversions (mirroring torch_import): conv kernels HWIO -> OIHW, linear
weights [in, out] -> [out, in], BN {scale, bias} + {mean, var} ->
{weight, bias, running_mean, running_var, num_batches_tracked}.

Export operates on the CANONICAL (unfolded) variable tree — the one
`build_backbone(...).init`, `torch_import`, and the trainer produce, with a
separate `batch_stats` collection. A BN-folded inference tree
(`models.fold`) has lost the running statistics and cannot round-trip.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from facerecognitionpipeline_tpu.models.irse import BACKBONE_CONFIGS


def _np(v) -> np.ndarray:
    return np.asarray(v, dtype=np.float32)


def _put_conv(out: dict, key: str, kernel) -> None:
    # flax HWIO -> torch OIHW
    out[f"{key}.weight"] = _np(kernel).transpose(3, 2, 0, 1)


def _put_bn(out: dict, prefix: str, params: Mapping | None, stats: Mapping) -> None:
    if params is not None:
        out[f"{prefix}.weight"] = _np(params["scale"])
        out[f"{prefix}.bias"] = _np(params["bias"])
    out[f"{prefix}.running_mean"] = _np(stats["mean"])
    out[f"{prefix}.running_var"] = _np(stats["var"])
    # torch BatchNorm statedicts carry the tracking counter; zero is what a
    # freshly-constructed torch module expects type-wise (int64 scalar)
    out[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)


def export_statedict(
    variables: Mapping[str, Any], architecture: str
) -> dict[str, np.ndarray]:
    """flax {'params', 'batch_stats'} -> AdaFace-zoo torch statedict
    (numpy values; see `save_adaface_checkpoint` for a .ckpt file)."""
    cfg = BACKBONE_CONFIGS[architecture]
    units, use_se = cfg["units"], cfg["use_se"]
    params = variables["params"]
    try:
        stats = variables["batch_stats"]
    except KeyError:
        raise ValueError(
            "variables have no 'batch_stats' collection — this looks like a "
            "BN-folded inference tree (models.fold), which has lost the "
            "running statistics; export the canonical tree instead"
        ) from None

    sd: dict[str, np.ndarray] = {}
    _put_conv(sd, "input_layer.0", params["input_conv"]["kernel"])
    _put_bn(sd, "input_layer.1", params["input_bn"], stats["input_bn"])
    sd["input_layer.2.weight"] = _np(params["input_prelu"]["alpha"])

    k = 0
    in_ch = 64
    for stage, (n_units, depth) in enumerate(zip(units, (64, 128, 256, 512))):
        for unit in range(n_units):
            name = f"stage{stage}_unit{unit}"
            bp, bs = params[name], stats[name]
            base = f"body.{k}"
            if in_ch != depth:
                _put_conv(
                    sd, f"{base}.shortcut_layer.0",
                    bp["shortcut_conv"]["kernel"],
                )
                _put_bn(
                    sd, f"{base}.shortcut_layer.1",
                    bp["shortcut_bn"], bs["shortcut_bn"],
                )
            _put_bn(sd, f"{base}.res_layer.0", bp["res_bn1"], bs["res_bn1"])
            _put_conv(sd, f"{base}.res_layer.1", bp["res_conv1"]["kernel"])
            _put_bn(sd, f"{base}.res_layer.2", bp["res_bn2"], bs["res_bn2"])
            sd[f"{base}.res_layer.3.weight"] = _np(bp["res_prelu"]["alpha"])
            _put_conv(sd, f"{base}.res_layer.4", bp["res_conv2"]["kernel"])
            _put_bn(sd, f"{base}.res_layer.5", bp["res_bn3"], bs["res_bn3"])
            if use_se:
                _put_conv(sd, f"{base}.res_layer.6.fc1", bp["se"]["fc1"]["kernel"])
                _put_conv(sd, f"{base}.res_layer.6.fc2", bp["se"]["fc2"]["kernel"])
            in_ch = depth
            k += 1

    _put_bn(sd, "output_layer.0", params["output_bn"], stats["output_bn"])
    sd["output_layer.3.weight"] = _np(params["output_fc"]["kernel"]).T
    sd["output_layer.3.bias"] = _np(params["output_fc"]["bias"])
    _put_bn(sd, "output_layer.4", None, stats["output_feature_bn"])
    return sd


def save_adaface_checkpoint(
    variables: Mapping[str, Any],
    architecture: str,
    path: str,
    prefix: str = "model.",
) -> None:
    """Write a reference-loadable `.ckpt`: `{'state_dict': {'model.<k>': t}}`
    (the Lightning wrapping `face_embedder.py:49-53` strips). Requires torch
    only for serialization, mirroring `load_adaface_checkpoint`."""
    import torch

    sd = export_statedict(variables, architecture)
    blob = {
        "state_dict": {
            prefix + k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items()
        }
    }
    torch.save(blob, path)
