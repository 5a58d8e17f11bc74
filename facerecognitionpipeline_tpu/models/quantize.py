"""Post-training int8 quantization of the folded IR backbones.

The two 3x3 res convs of every BasicBlockIR unit carry ~99% of the backbone
FLOPs (per-unit cost is constant across stages: 2 * 9 * H^2 * C^2 with H*C
fixed by the architecture). On TPU v5e the MXU runs s8 x s8 -> s32 at ~2x
the bf16 FLOP rate (370 vs 193 TF/s measured on this chip), so quantizing
exactly those convs buys most of the int8 ceiling while keeping every
accuracy-sensitive op (input conv, affines, PReLU, SE, shortcut convs, the
output fc and the final normalization) in the float compute dtype.

Scheme (standard post-training quantization):
* weights: symmetric per-OUTPUT-channel int8 — scale[oc] = max|w[...,oc]|/127,
  exact zero point (symmetric), baked offline from the BN-folded f32 kernels;
* activations: symmetric per-tensor int8 with a STATIC calibrated scale —
  one f32 scalar per conv input, the max |x| observed over a calibration
  batch. Static scales keep the quantize step a pure elementwise op that XLA
  fuses into the preceding affine/PReLU (a dynamic per-batch amax would add
  a serializing full reduction per layer).

The reference has no quantization story (its ONNX/torch backends run fp32,
`face_embedder.py:49-88`); this is a TPU-native serving lever. Accuracy
evidence: tests/test_quantize.py (cosine vs the fp32 forward) and the
synthetic end-to-end eval.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

_QMAX = 127.0


def calibrate_activation_amax(model, variables, faces_pm1) -> Dict[str, Dict[str, float]]:
    """Observe per-conv-input max|activation| on a calibration batch.

    model/variables: a FOLDED (not quantized) backbone and its variables.
    faces_pm1: [N, S, S, 3] preprocessed faces (BGR, [-1, 1]) — the exact
    tensor the backbone consumes (ops/image.preprocess_faces output).

    Returns {block_name: {'res_conv1': amax, 'res_conv2': amax}} keyed like
    the params tree. The amax reduction runs inside one jitted program so
    the captured intermediates never leave the device.
    """

    @jax.jit
    def run(v, x):
        _, tree = model.apply(
            v, x, capture_intermediates=True, mutable=["intermediates"]
        )
        inter = tree["intermediates"]
        out = {}
        for blk, sub in inter.items():
            if not blk.startswith("stage"):
                continue
            out[blk] = {
                # conv input = the preceding elementwise op's output
                "res_conv1": jnp.max(
                    jnp.abs(sub["res_affine"]["__call__"][0].astype(jnp.float32))
                ),
                "res_conv2": jnp.max(
                    jnp.abs(sub["res_prelu"]["__call__"][0].astype(jnp.float32))
                ),
            }
        return out

    amax = jax.device_get(run(variables, jnp.asarray(faces_pm1)))
    return {
        blk: {k: float(v) for k, v in sub.items()} for blk, sub in amax.items()
    }


def quantize_folded_variables(
    folded_variables: dict,
    activation_amax: Dict[str, Dict[str, float]],
    headroom: float = 1.0,
) -> dict:
    """Rewrite folded backbone variables into the quantized form.

    Input: {'params': ...} from fold.fold_inference_variables.
    Output: {'params': ...} for `build_backbone(arch, folded=True,
    quantized=True)` — res convs become {kernel_q int8, scale f32[oc],
    bias f32, act_scale f32 scalar}; everything else copies through.

    headroom: multiplier on the calibrated activation amax (>1 leaves room
    for inputs hotter than the calibration set, at the cost of one LSB of
    resolution per doubling).
    """
    params = folded_variables["params"]
    out: dict = {}
    for name, p in params.items():
        if not name.startswith("stage"):
            out[name] = jax.tree_util.tree_map(np.asarray, p)
            continue
        if name not in activation_amax:
            raise ValueError(
                f"no calibrated activation amax for block {name!r} — "
                f"calibrate_activation_amax must run on the same architecture"
            )
        blk = {}
        for key, sub in p.items():
            if key in ("res_conv1", "res_conv2"):
                w = np.asarray(sub["kernel"], np.float32)  # HWIO
                w_scale = np.maximum(
                    np.max(np.abs(w), axis=(0, 1, 2)) / _QMAX, 1e-12
                )
                kq = np.clip(
                    np.round(w / w_scale), -_QMAX, _QMAX
                ).astype(np.int8)
                a = activation_amax[name][key] * headroom
                blk[key] = {
                    "kernel_q": kq,
                    "scale": w_scale.astype(np.float32),
                    "bias": np.asarray(sub["bias"], np.float32),
                    "act_scale": np.float32(max(a, 1e-12) / _QMAX),
                }
            else:
                blk[key] = jax.tree_util.tree_map(np.asarray, sub)
        out[name] = blk
    return {"params": out}


def fuse_quantized_params(quantized_variables: dict) -> dict:
    """Rewrite quantize_folded_variables output for the FUSED int8 body
    (irse.FusedQuantBody; build_backbone(..., quantized=True,
    fused_int8=True)).

    Pure offline algebra — see the FusedQuantBody docstring for the
    derivation. Per unit, {res_affine, res_conv1, res_prelu, res_conv2}
    collapse into one 'body' dict:

      qscale    = affine.scale / s1          qshift   = affine.shift / s1
      mid_scale = (s1 * w1_scale) / s2       mid_bias = b1 / s2
      out_scale = s2 * w2_scale              out_bias = b2
      (s_i = res_conv_i.act_scale; alpha passes through — PReLU commutes
      with the positive 1/s2.)

    Shortcut convs / SE / non-stage params copy through unchanged.
    """
    params = quantized_variables["params"]
    out: dict = {}
    for name, p in params.items():
        if not name.startswith("stage"):
            out[name] = jax.tree_util.tree_map(np.asarray, p)
            continue
        c1, c2 = p["res_conv1"], p["res_conv2"]
        s1 = np.float32(c1["act_scale"])
        s2 = np.float32(c2["act_scale"])
        blk = {
            "body": {
                "qscale": np.asarray(p["res_affine"]["scale"], np.float32) / s1,
                "qshift": np.asarray(p["res_affine"]["shift"], np.float32) / s1,
                "kernel1_q": np.asarray(c1["kernel_q"], np.int8),
                "mid_scale": (
                    s1 * np.asarray(c1["scale"], np.float32)
                ) / s2,
                "mid_bias": np.asarray(c1["bias"], np.float32) / s2,
                "alpha": np.asarray(p["res_prelu"]["alpha"], np.float32),
                "kernel2_q": np.asarray(c2["kernel_q"], np.int8),
                "out_scale": s2 * np.asarray(c2["scale"], np.float32),
                "out_bias": np.asarray(c2["bias"], np.float32),
            }
        }
        for key, sub in p.items():
            if key not in ("res_affine", "res_conv1", "res_prelu", "res_conv2"):
                blk[key] = jax.tree_util.tree_map(np.asarray, sub)
        out[name] = blk
    return {"params": out}


def quantize_detector_variables(
    variables: dict,
    activation_amax: Dict[str, Dict[str, float]],
    headroom: float = 1.0,
) -> dict:
    """Rewrite MTCNN detector variables for quantized R/O-nets.

    variables: the float {'pnet'/'rnet'/'onet': {'params': ...}} tree;
    activation_amax: {'rnet': {'conv1': a, ..., 'fc1': a}, 'onet': {...}}
    from MTCNNDetector.calibrate_amax. conv1..N and fc1 of rnet/onet become
    {kernel_q int8, scale f32[oc], bias f32, act_scale f32 scalar}
    (QuantConv/QuantDense layout); P-net, PReLUs and the cls/reg/landmark
    heads copy through unchanged. Per-output-channel weight scales reduce
    over every axis but the last (works for HWIO conv kernels and [in, out]
    dense kernels alike)."""
    out = {"pnet": jax.tree_util.tree_map(np.asarray, variables["pnet"])}
    for net in ("rnet", "onet"):
        amax = activation_amax[net]
        params = variables[net]["params"]
        q: dict = {}
        for key, sub in params.items():
            if key not in amax:
                q[key] = jax.tree_util.tree_map(np.asarray, sub)
                continue
            w = np.asarray(sub["kernel"], np.float32)
            w_scale = np.maximum(
                np.max(np.abs(w), axis=tuple(range(w.ndim - 1))) / _QMAX,
                1e-12,
            )
            kq = np.clip(np.round(w / w_scale), -_QMAX, _QMAX).astype(np.int8)
            a = amax[key] * headroom
            q[key] = {
                "kernel_q": kq,
                "scale": w_scale.astype(np.float32),
                "bias": np.asarray(sub["bias"], np.float32),
                "act_scale": np.float32(max(a, 1e-12) / _QMAX),
            }
        out[net] = {"params": q}
    return out


def default_calibration_frames(
    det_size: tuple[int, int] = (640, 640), n: int = 6, seed: int = 0
) -> np.ndarray:
    """Synthetic full-frame calibration scenes for detector quantization:
    a spread of stress categories (multi-face, crowded, tiny, noisy,
    low-contrast, empty/hard-negative) rendered square and resized to
    det_size, so the R/O-net activation ranges cover both face crops and
    background/distractor crops. Raw RGB uint8 [n, H, W, 3]. For imported
    real-world detector weights, calibrate on real frames instead
    (MTCNNDetector(quantize='int8', calib_frames=...))."""
    import cv2

    from facerecognitionpipeline_tpu.evalharness.detection import (
        render_stress_scene,
    )

    cats = ["baseline", "crowded", "tiny", "noisy", "low_contrast",
            "hard_negatives"]
    rng = np.random.default_rng(seed)
    h, w = det_size
    frames = []
    for i in range(n):
        img, _ = render_stress_scene(rng, cats[i % len(cats)], size=min(h, w))
        if img.shape[:2] != (h, w):
            img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
        frames.append(img.astype(np.uint8))
    return np.stack(frames)


def load_calibration_faces(
    directory: str, size: int = 112, limit: int = 256
) -> np.ndarray:
    """Load aligned face crops from a directory for activation calibration.

    Reads every image under `directory` (recursively; jpg/png/bmp), resizes
    to `size`x`size` RGB uint8, caps at `limit`. This is how a deployment
    serving IMPORTED real-world weights supplies real calibration data
    (server/live `--quantize_calib DIR`) instead of the synthetic default.
    """
    import cv2

    from facerecognitionpipeline_tpu.utils.io import VALID_EXTENSIONS, imread_rgb

    crops = []
    for root, _, files in sorted(os.walk(directory)):
        for fname in sorted(files):
            if os.path.splitext(fname)[1].lower() not in VALID_EXTENSIONS:
                continue
            img = imread_rgb(os.path.join(root, fname))
            if img is None:
                continue
            if img.shape[:2] != (size, size):
                img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
            crops.append(img.astype(np.uint8))
            if len(crops) >= limit:
                break
        if len(crops) >= limit:
            break
    if not crops:
        raise ValueError(
            f"no readable calibration images under {directory!r} "
            f"(extensions {sorted(VALID_EXTENSIONS)})"
        )
    return np.stack(crops)


def default_calibration_faces(
    n: int = 64, seed: int = 0, size: int = 112
) -> np.ndarray:
    """Deterministic synthetic calibration crops: rendered identity faces
    with pose/lighting jitter (the renderer the shipped detector/embedder
    weights were trained on), plus a few uniform-noise frames so the scales
    cover textureless extremes. Returns raw RGB uint8 [n, size, size, 3];
    callers preprocess with ops.image.preprocess_faces.

    For imported real-world weights, calibrate on a sample of REAL aligned
    faces instead (FaceEmbedder(quantize='int8', calib_faces=...)) — scales
    observed on synthetic renders transfer only approximately.
    """
    from facerecognitionpipeline_tpu.train.detector_train import (
        make_identity,
        render_identity_crop,
    )

    rng = np.random.default_rng(seed)
    n_noise = max(2, n // 16)
    crops = []
    for i in range(n - n_noise):
        ident = make_identity(seed * 1000 + i % 16)
        crops.append(render_identity_crop(ident, rng, size=size))
    for _ in range(n_noise):
        crops.append(
            rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
        )
    return np.stack(crops)
