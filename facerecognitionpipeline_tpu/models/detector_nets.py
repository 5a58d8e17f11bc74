"""P-Net / R-Net / O-Net: the multi-task cascaded detector networks.

Standard MTCNN topology (Zhang et al. 2016, arXiv:1604.02878 — see
PAPERS.md) in flax/NHWC, replacing the reference's delegation to the
insightface SCRFD ONNX detector (`face_recognition.py:24-29`). The cascade
around them lives in `detector.py`. Valid (unpadded) convolutions and
ceil-mode max pooling match the canonical published weights' layouts so
public MTCNN statedicts import directly (see `load_mtcnn_torch_statedict`).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from facerecognitionpipeline_tpu.models.irse import PReLU, QuantConv, QuantDense


def _pool(x: jax.Array, window: int, stride: int) -> jax.Array:
    """Ceil-mode max pool (torch MaxPool2d(ceil_mode=True) semantics)."""
    h, w = x.shape[1], x.shape[2]
    pad_h = max(0, (-(h - window) % stride)) if h > window else 0
    pad_w = max(0, (-(w - window) % stride)) if w > window else 0
    return nn.max_pool(
        x,
        (window, window),
        strides=(stride, stride),
        padding=((0, pad_h), (0, pad_w)),
    )


class PNet(nn.Module):
    """Proposal net: fully convolutional, stride 2, 12x12 receptive field.
    Returns (prob map [B,H',W'], reg map [B,H',W',4])."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        x = x.astype(self.dtype)
        x = nn.Conv(10, (3, 3), padding="VALID", dtype=self.dtype, name="conv1")(x)
        x = PReLU(name="prelu1")(x)
        x = _pool(x, 2, 2)
        x = nn.Conv(16, (3, 3), padding="VALID", dtype=self.dtype, name="conv2")(x)
        x = PReLU(name="prelu2")(x)
        x = nn.Conv(32, (3, 3), padding="VALID", dtype=self.dtype, name="conv3")(x)
        x = PReLU(name="prelu3")(x)
        logits = nn.Conv(2, (1, 1), dtype=self.dtype, name="cls")(x)
        reg = nn.Conv(4, (1, 1), dtype=self.dtype, name="reg")(x)
        prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., 1]
        return prob, reg.astype(jnp.float32)


def _conv(quantized: bool, features: int, ksize: int, dtype, name: str):
    """VALID conv layer factory: float nn.Conv or static-scale int8
    QuantConv (per-output-channel weights + calibrated activation scale;
    variables from `models.quantize.quantize_detector_variables`)."""
    if quantized:
        return QuantConv(
            features, (ksize, ksize), strides=1, padding=0, dtype=dtype,
            name=name,
        )
    return nn.Conv(
        features, (ksize, ksize), padding="VALID", dtype=dtype, name=name
    )


def _dense(quantized: bool, features: int, dtype, name: str):
    if quantized:
        return QuantDense(features, dtype=dtype, name=name)
    return nn.Dense(features, dtype=dtype, name=name)


class RNet(nn.Module):
    """Refine net on 24x24 crops -> (prob [B], reg [B,4]).

    quantized=True swaps conv1-3 and fc1 for int8 QuantConv/QuantDense (the
    FLOP carriers; ~2x MXU rate on v5e — see models/quantize.py). The
    cls/reg heads and PReLUs stay in the float compute dtype: they are
    negligible FLOPs and directly decide scores/boxes."""

    dtype: Any = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        x = x.astype(self.dtype)
        x = _conv(self.quantized, 28, 3, self.dtype, "conv1")(x)
        x = PReLU(name="prelu1")(x)
        x = _pool(x, 3, 2)
        x = _conv(self.quantized, 48, 3, self.dtype, "conv2")(x)
        x = PReLU(name="prelu2")(x)
        x = _pool(x, 3, 2)
        x = _conv(self.quantized, 64, 2, self.dtype, "conv3")(x)
        x = PReLU(name="prelu3")(x)
        # torch flattens NCHW: transpose so imported dense weights line up.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = _dense(self.quantized, 128, self.dtype, "fc1")(x)
        x = PReLU(name="prelu4")(x)
        logits = nn.Dense(2, dtype=self.dtype, name="cls")(x)
        reg = nn.Dense(4, dtype=self.dtype, name="reg")(x)
        prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]
        return prob, reg.astype(jnp.float32)


class ONet(nn.Module):
    """Output net on 48x48 crops -> (prob [B], reg [B,4], landmarks [B,5,2]).

    Landmarks are box-relative fractions (x then y in canonical layout).
    quantized: int8 conv1-4 + fc1, same scheme as RNet."""

    dtype: Any = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
        x = x.astype(self.dtype)
        x = _conv(self.quantized, 32, 3, self.dtype, "conv1")(x)
        x = PReLU(name="prelu1")(x)
        x = _pool(x, 3, 2)
        x = _conv(self.quantized, 64, 3, self.dtype, "conv2")(x)
        x = PReLU(name="prelu2")(x)
        x = _pool(x, 3, 2)
        x = _conv(self.quantized, 64, 3, self.dtype, "conv3")(x)
        x = PReLU(name="prelu3")(x)
        x = _pool(x, 2, 2)
        x = _conv(self.quantized, 128, 2, self.dtype, "conv4")(x)
        x = PReLU(name="prelu4")(x)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = _dense(self.quantized, 256, self.dtype, "fc1")(x)
        x = PReLU(name="prelu5")(x)
        logits = nn.Dense(2, dtype=self.dtype, name="cls")(x)
        reg = nn.Dense(4, dtype=self.dtype, name="reg")(x)
        lmk = nn.Dense(10, dtype=self.dtype, name="landmarks")(x)
        prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]
        lmk = lmk.astype(jnp.float32)
        # canonical layout: [x1..x5, y1..y5] -> [5, 2]
        lmk = jnp.stack([lmk[:, :5], lmk[:, 5:]], axis=-1)
        return prob, reg.astype(jnp.float32), lmk


def init_detector_variables(seed: int = 0) -> dict:
    """Random-init variables for all three nets (testing / benchmarking)."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    return {
        "pnet": PNet().init(k1, jnp.zeros((1, 12, 12, 3))),
        "rnet": RNet().init(k2, jnp.zeros((1, 24, 24, 3))),
        "onet": ONet().init(k3, jnp.zeros((1, 48, 48, 3))),
    }


def _np(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def load_mtcnn_torch_statedict(statedicts: dict) -> dict:
    """Convert public MTCNN torch statedicts into our variables.

    `statedicts` maps 'pnet'/'rnet'/'onet' to torch statedicts using the
    widely-published naming (conv1..4, prelu1..5, dense4/5/6 or conv4_1-style
    heads). Conv kernels OIHW->HWIO; dense [out,in]->[in,out].
    """
    def conv(sd, k):
        return {"kernel": _np(sd[f"{k}.weight"]).transpose(2, 3, 1, 0),
                "bias": _np(sd[f"{k}.bias"])}

    def dense(sd, k):
        return {"kernel": _np(sd[f"{k}.weight"]).T, "bias": _np(sd[f"{k}.bias"])}

    def prelu(sd, k):
        return {"alpha": _np(sd[f"{k}.weight"])}

    def pick(sd, *names):
        for n in names:
            if f"{n}.weight" in sd:
                return n
        raise KeyError(f"none of {names} in statedict")

    p = statedicts["pnet"]
    pnet = {
        "conv1": conv(p, "conv1"), "prelu1": prelu(p, "prelu1"),
        "conv2": conv(p, "conv2"), "prelu2": prelu(p, "prelu2"),
        "conv3": conv(p, "conv3"), "prelu3": prelu(p, "prelu3"),
        "cls": conv(p, pick(p, "conv4_1", "cls")),
        "reg": conv(p, pick(p, "conv4_2", "reg")),
    }
    r = statedicts["rnet"]
    rnet = {
        "conv1": conv(r, "conv1"), "prelu1": prelu(r, "prelu1"),
        "conv2": conv(r, "conv2"), "prelu2": prelu(r, "prelu2"),
        "conv3": conv(r, "conv3"), "prelu3": prelu(r, "prelu3"),
        "fc1": dense(r, pick(r, "dense4", "fc1")), "prelu4": prelu(r, "prelu4"),
        "cls": dense(r, pick(r, "dense5_1", "cls")),
        "reg": dense(r, pick(r, "dense5_2", "reg")),
    }
    o = statedicts["onet"]
    onet = {
        "conv1": conv(o, "conv1"), "prelu1": prelu(o, "prelu1"),
        "conv2": conv(o, "conv2"), "prelu2": prelu(o, "prelu2"),
        "conv3": conv(o, "conv3"), "prelu3": prelu(o, "prelu3"),
        "conv4": conv(o, "conv4"), "prelu4": prelu(o, "prelu4"),
        "fc1": dense(o, pick(o, "dense5", "fc1")), "prelu5": prelu(o, "prelu5"),
        "cls": dense(o, pick(o, "dense6_1", "cls")),
        "reg": dense(o, pick(o, "dense6_2", "reg")),
        "landmarks": dense(o, pick(o, "dense6_3", "landmarks")),
    }
    return {
        "pnet": {"params": pnet},
        "rnet": {"params": rnet},
        "onet": {"params": onet},
    }
