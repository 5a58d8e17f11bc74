"""IR / IR-SE ResNet embedding backbones (ir_18/34/50/101/152, ir_se_*).

JAX/flax reimplementation of the AdaFace model-zoo architecture that the
reference consumes as an external dependency (`net.build_model(arch)`,
imported at reference `face_embedder.py:11`; forward contract
`features, norm = model(x)` used at `face_embedder.py:119,157`).

Architecture (per SURVEY.md §2 #6):
  input  : Conv3x3(3→64, s1) → BN → PReLU
  body   : stacked BasicBlockIR[SE] units
             shortcut = identity-ish (MaxPool1x1/s) or Conv1x1(s)+BN
             residual = BN → Conv3x3(s1) → BN → PReLU → Conv3x3(s) → BN [→ SE]
  output : BN → Dropout(0.4) → Flatten → Linear(512·7·7 → 512) → BN1d(no affine)
  head   : feature = x / ||x||, returned together with ||x||.

TPU-first details: NHWC layout throughout (MXU-friendly conv layouts),
optional bfloat16 compute with float32 params/statistics, no Python control
flow on traced values, and a single jitted forward over the whole padded face
batch instead of the reference's per-32 chunked torch loop
(`face_embedder.py:146-161`).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# (depth, num_units, stride of first unit) per stage; channels double per stage.
# Unit counts follow the AdaFace zoo layer recipes.
BACKBONE_CONFIGS: dict[str, dict[str, Any]] = {
    "ir_micro": {"units": (1, 1, 1, 1), "use_se": False},  # smoke tests only
    "ir_18": {"units": (2, 2, 2, 2), "use_se": False},
    "ir_34": {"units": (3, 4, 6, 3), "use_se": False},
    "ir_50": {"units": (3, 4, 14, 3), "use_se": False},
    "ir_101": {"units": (3, 13, 30, 3), "use_se": False},
    "ir_152": {"units": (3, 8, 36, 3), "use_se": False},
    "ir_se_50": {"units": (3, 4, 14, 3), "use_se": True},
    "ir_se_101": {"units": (3, 13, 30, 3), "use_se": True},
    # insightface/arcface_torch 'iresnet' family: identical blocks except the
    # stride-2 equal-channel shortcut is conv1x1+BN instead of subsampling.
    "iresnet_18": {"units": (2, 2, 2, 2), "use_se": False, "conv_shortcut": True},
    "iresnet_34": {"units": (3, 4, 6, 3), "use_se": False, "conv_shortcut": True},
    "iresnet_50": {"units": (3, 4, 14, 3), "use_se": False, "conv_shortcut": True},
    "iresnet_100": {"units": (3, 13, 30, 3), "use_se": False, "conv_shortcut": True},
}
_STAGE_CHANNELS = (64, 128, 256, 512)


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C) semantics)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param(
            "alpha", nn.initializers.constant(0.25), (x.shape[-1],), jnp.float32
        )
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class Affine(nn.Module):
    """Per-channel scale+shift: an inference-mode BatchNorm collapsed to its
    affine form (y = x * scale + shift). Used by the folded backbone for the
    one BN per residual unit that precedes a conv (pre-conv BNs cannot be
    folded into the conv exactly because of zero padding at the borders)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        shift = self.param("shift", nn.initializers.zeros, (c,), jnp.float32)
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class QuantConv(nn.Module):
    """Static-scale int8 conv for the quantized inference backbone.

    Carries a per-output-channel symmetric int8 `kernel_q` with its f32
    dequantization `scale`, the folded BN `bias`, and one calibrated f32
    `act_scale` for the input tensor (see models/quantize.py). The input is
    quantized on the fly (round/clip — fuses into the previous elementwise
    op), the conv runs s8 x s8 -> s32 on the MXU int8 path (~2x the bf16
    FLOP rate on v5e: 370 vs 193 TF/s measured on 4096^3 matmuls), and the
    output is dequantized into the compute dtype with the bias applied.
    """

    features: int
    kernel_size: tuple = (3, 3)
    strides: int = 1
    padding: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        kq = self.param(
            "kernel_q",
            nn.initializers.zeros,
            (*self.kernel_size, c_in, self.features),
            jnp.int8,
        )
        w_scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        act_scale = self.param(
            "act_scale", nn.initializers.ones, (), jnp.float32
        )
        # Quantize the activation in f32 (bf16 rounding at magnitude ~127
        # would add up to +-0.25 extra noise per element).
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (1.0 / act_scale)), -127, 127
        ).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(
            xq.shape, kq.shape, ("NHWC", "HWIO", "NHWC")
        )
        p = self.padding
        y = jax.lax.conv_general_dilated(
            xq,
            kq,
            (self.strides, self.strides),
            [(p, p), (p, p)],
            dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        out_scale = (act_scale * w_scale).astype(self.dtype)
        return y.astype(self.dtype) * out_scale + bias.astype(self.dtype)


class QuantDense(nn.Module):
    """Static-scale int8 dense layer (the fully-connected analogue of
    QuantConv): per-output-channel symmetric int8 `kernel_q` with f32
    dequantization `scale`, f32 `bias`, and one calibrated f32 `act_scale`
    for the input. Used by the quantized detector R/O-net heads
    (models/detector_nets.py) — the backbone's output fc stays float
    (accuracy-critical, negligible FLOPs)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        kq = self.param(
            "kernel_q", nn.initializers.zeros, (c_in, self.features), jnp.int8
        )
        w_scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        act_scale = self.param(
            "act_scale", nn.initializers.ones, (), jnp.float32
        )
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (1.0 / act_scale)), -127, 127
        ).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, kq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out_scale = (act_scale * w_scale).astype(self.dtype)
        return y.astype(self.dtype) * out_scale + bias.astype(self.dtype)


from functools import partial  # noqa: E402


def _f32_conv(x, w, strides, padding):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
    )
    p = padding
    return jax.lax.conv_general_dilated(
        x, w, (strides, strides), [(p, p), (p, p)], dimension_numbers=dn
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def int8_fwd_conv(x, w, strides: int, padding: int):
    """Conv whose FORWARD runs s8 x s8 -> s32 on the MXU int8 path with
    dynamic scales (per-tensor activation amax, per-output-channel weight
    amax), while the BACKWARD is the exact float conv VJP on the saved
    unquantized operands (straight-through estimator). The int8-training
    probe (VERDICT r4 #6, examples/train_int8_probe.py): forward conv FLOPs
    at the int8 rate, bf16-exact gradients."""
    ax = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-12) / 127.0
    aw = jnp.maximum(
        jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2)), 1e-12
    ) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ax), -127, 127).astype(
        jnp.int8
    )
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / aw), -127, 127).astype(
        jnp.int8
    )
    dn = jax.lax.conv_dimension_numbers(
        xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC")
    )
    p = padding
    y = jax.lax.conv_general_dilated(
        xq, wq, (strides, strides), [(p, p), (p, p)], dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (ax * aw)).astype(x.dtype)


def _int8_fwd_conv_fwd(x, w, strides, padding):
    return int8_fwd_conv(x, w, strides, padding), (x, w)


def _int8_fwd_conv_bwd(strides, padding, res, g):
    x, w = res
    # jax.vjp re-traces the float conv, but its PRIMAL output is unused, so
    # XLA dead-code-eliminates it — the bwd pays exactly the standard
    # dgrad+wgrad convs, nothing more.
    _, vjp_fn = jax.vjp(
        lambda a, b: _f32_conv(a, b, strides, padding), x, w
    )
    return vjp_fn(g)


int8_fwd_conv.defvjp(_int8_fwd_conv_fwd, _int8_fwd_conv_bwd)


class Int8FwdConv(nn.Module):
    """Training-mode conv with int8 forward / float backward (see
    int8_fwd_conv). Declares the same {'kernel'} param as the nn.Conv it
    replaces, so checkpoints/exports are interchangeable."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: int = 1
    padding: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, c_in, self.features),
            jnp.float32,
        )
        return int8_fwd_conv(
            x.astype(self.dtype), w.astype(self.dtype), self.strides,
            self.padding,
        )


class FusedQuantBody(nn.Module):
    """The residual body of a quantized unit as ONE algebraically-fused
    int8 chain (round-5 int8-roofline work, VERDICT r4 #3).

    The unfused path (Affine -> QuantConv -> PReLU -> QuantConv) round-trips
    through the compute dtype between every op: affine out, quantize in,
    dequant out, PReLU, quantize in, dequant out — each a full-tensor
    elementwise pass whose fusion (and intermediate dtype) is left to XLA.
    This module precomputes the algebra offline
    (`quantize.fuse_quantized_params`) so the chain is exactly three
    elementwise kernels around the two MXU convs, with int8 the ONLY
    materialized intermediate dtype:

      prologue : xq = sat(round(x * qscale + qshift))       [int8]
                 (the pre-conv affine folded into the quantize: round((x*sc
                 + sh)/s1) == round(x*(sc/s1) + (sh/s1)))
      conv1    : s8 x s8 -> s32 on the MXU
      mid      : mq = sat(round(prelu(y1 * mid_scale + mid_bias)))  [int8]
                 (dequant -> PReLU -> requant collapsed: PReLU commutes
                 with the positive scale 1/s2, so the requant divide folds
                 into the dequant multiply and the PReLU alpha is untouched)
      conv2    : s8 x s8 -> s32 on the MXU
      epilogue : y2 * out_scale + out_bias -> compute dtype

    Numerics: equal to the unfused path up to f32 rounding in the folded
    constants (the round() boundaries can flip on exact .5 ties);
    tests/test_quantize.py pins agreement on real inputs.
    """

    depth: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        qscale = self.param("qscale", nn.initializers.ones, (c_in,), jnp.float32)
        qshift = self.param("qshift", nn.initializers.zeros, (c_in,), jnp.float32)
        k1 = self.param(
            "kernel1_q", nn.initializers.zeros, (3, 3, c_in, self.depth),
            jnp.int8,
        )
        mid_scale = self.param(
            "mid_scale", nn.initializers.ones, (self.depth,), jnp.float32
        )
        mid_bias = self.param(
            "mid_bias", nn.initializers.zeros, (self.depth,), jnp.float32
        )
        alpha = self.param(
            "alpha", nn.initializers.constant(0.25), (self.depth,), jnp.float32
        )
        k2 = self.param(
            "kernel2_q", nn.initializers.zeros,
            (3, 3, self.depth, self.depth), jnp.int8,
        )
        out_scale = self.param(
            "out_scale", nn.initializers.ones, (self.depth,), jnp.float32
        )
        out_bias = self.param(
            "out_bias", nn.initializers.zeros, (self.depth,), jnp.float32
        )

        def conv(v, k, stride):
            dn = jax.lax.conv_dimension_numbers(
                v.shape, k.shape, ("NHWC", "HWIO", "NHWC")
            )
            return jax.lax.conv_general_dilated(
                v, k, (stride, stride), [(1, 1), (1, 1)],
                dimension_numbers=dn, preferred_element_type=jnp.int32,
            )

        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) * qscale + qshift), -127, 127
        ).astype(jnp.int8)
        y1 = conv(xq, k1, 1)
        m = y1.astype(jnp.float32) * mid_scale + mid_bias
        m = jnp.where(m >= 0, m, alpha * m)
        mq = jnp.clip(jnp.round(m), -127, 127).astype(jnp.int8)
        y2 = conv(mq, k2, self.stride)
        return (
            y2.astype(jnp.float32) * out_scale + out_bias
        ).astype(self.dtype)


class SEModule(nn.Module):
    """Squeeze-and-excitation: GAP → 1x1 conv (C→C/r) → ReLU → 1x1 conv → sigmoid."""

    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(c // self.reduction, (1, 1), use_bias=False, dtype=self.dtype,
                    name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class BasicBlockIR(nn.Module):
    """One IR residual unit; `use_se=True` makes it the IR-SE variant.

    `conv_shortcut=True` (iresnet family) uses a conv1x1+BN shortcut whenever
    the block strides, even at equal channel counts."""

    depth: int
    stride: int
    use_se: bool
    conv_shortcut: bool = False
    folded: bool = False  # inference-only: post-conv BNs folded into convs
    quantized: bool = False  # folded + int8 res convs (see models/quantize.py)
    # quantized body as one fused int8 chain (FusedQuantBody; params from
    # quantize.fuse_quantized_params) instead of Affine+QuantConv+PReLU+
    # QuantConv — same math, fewer elementwise round-trips
    fused_int8: bool = False
    # TRAINING-mode int8 forward: res convs run s8xs8->s32 with dynamic
    # scales in fwd, exact float VJP in bwd (Int8FwdConv; the training
    # precision probe — examples/train_int8_probe.py)
    int8_fwd_train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=name,
        )
        conv_bias = self.folded  # folded convs carry the BN shift as a bias

        identity_ok = in_ch == self.depth and not (
            self.conv_shortcut and self.stride != 1
        )
        if identity_ok:
            # torch MaxPool2d(kernel=1, stride=s): pure subsampling.
            shortcut = x[:, :: self.stride, :: self.stride, :]
        else:
            shortcut = nn.Conv(
                self.depth, (1, 1), strides=self.stride, use_bias=conv_bias,
                dtype=self.dtype, name="shortcut_conv",
            )(x)
            if not self.folded:
                shortcut = bn("shortcut_bn")(shortcut)

        if self.quantized and self.fused_int8:
            r = FusedQuantBody(
                self.depth, stride=self.stride, dtype=self.dtype, name="body"
            )(x)
            if self.use_se:
                r = SEModule(dtype=self.dtype, name="se")(r)
            return r + shortcut

        # res_bn1 precedes its conv, so it survives folding as a bare affine.
        r = Affine(name="res_affine")(x) if self.folded else bn("res_bn1")(x)
        if self.quantized:
            # The two 3x3 res convs carry ~99% of the backbone FLOPs; they
            # run int8 on the MXU fast path. Everything around them (affine,
            # PReLU, SE, shortcut 1x1 convs) stays in the compute dtype —
            # negligible FLOPs, and keeping them high-precision bounds the
            # quantization error to the two matmuls per unit.
            r = QuantConv(self.depth, (3, 3), dtype=self.dtype,
                          name="res_conv1")(r)
        elif self.int8_fwd_train and not self.folded:
            r = Int8FwdConv(self.depth, (3, 3), dtype=self.dtype,
                            name="res_conv1")(r)
            r = bn("res_bn2")(r)
        else:
            r = nn.Conv(self.depth, (3, 3), padding=1, use_bias=conv_bias,
                        dtype=self.dtype, name="res_conv1")(r)
            if not self.folded:
                r = bn("res_bn2")(r)
        r = PReLU(name="res_prelu")(r)
        if self.quantized:
            r = QuantConv(self.depth, (3, 3), strides=self.stride,
                          dtype=self.dtype, name="res_conv2")(r)
        elif self.int8_fwd_train and not self.folded:
            r = Int8FwdConv(self.depth, (3, 3), strides=self.stride,
                            dtype=self.dtype, name="res_conv2")(r)
            r = bn("res_bn3")(r)
        else:
            r = nn.Conv(self.depth, (3, 3), strides=self.stride, padding=1,
                        use_bias=conv_bias, dtype=self.dtype, name="res_conv2")(r)
            if not self.folded:
                r = bn("res_bn3")(r)
        if self.use_se:
            r = SEModule(dtype=self.dtype, name="se")(r)
        return r + shortcut


class IRBackbone(nn.Module):
    """Full IR/IR-SE backbone; __call__ returns (l2-normalized feature, norm)."""

    units: Sequence[int]
    use_se: bool = False
    conv_shortcut: bool = False
    folded: bool = False  # inference-only: BNs folded into convs/fc (see fold.py)
    quantized: bool = False  # folded + int8 res convs (see models/quantize.py)
    fused_int8: bool = False  # fused quantized body (FusedQuantBody)
    int8_fwd_train: bool = False  # training probe: int8 fwd / float bwd convs
    embedding_dim: int = 512
    input_size: int = 112
    dtype: Any = jnp.float32  # compute dtype; params stay float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> tuple[jax.Array, jax.Array]:
        """x: [B, input_size, input_size, 3] normalized BGR in [-1, 1], NHWC."""
        if self.folded and train:
            raise ValueError(
                "folded=True is an inference-only structure (BN statistics are "
                "baked into conv weights); train with folded=False."
            )
        if self.quantized and not self.folded:
            raise ValueError(
                "quantized=True requires folded=True (int8 kernels are "
                "produced from BN-folded weights; see models/quantize.py)."
            )
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        x = x.astype(self.dtype)
        x = nn.Conv(64, (3, 3), padding=1, use_bias=self.folded, dtype=self.dtype,
                    name="input_conv")(x)
        if not self.folded:
            x = bn("input_bn")(x)
        x = PReLU(name="input_prelu")(x)

        for stage, (n_units, depth) in enumerate(zip(self.units, _STAGE_CHANNELS)):
            for unit in range(n_units):
                x = BasicBlockIR(
                    depth=depth,
                    stride=2 if unit == 0 else 1,
                    use_se=self.use_se,
                    conv_shortcut=self.conv_shortcut,
                    folded=self.folded,
                    quantized=self.quantized,
                    fused_int8=self.fused_int8,
                    int8_fwd_train=self.int8_fwd_train,
                    dtype=self.dtype,
                    name=f"stage{stage}_unit{unit}",
                )(x, train=train)

        if not self.folded:
            x = bn("output_bn")(x)
        x = nn.Dropout(0.4, deterministic=not train, name="output_dropout")(x)
        b = x.shape[0]
        # torch Flatten on NCHW gives channel-major ordering; transpose so an
        # imported torch Linear weight matrix lines up element-for-element.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        # When folded, output_bn (pre-fc channel affine) and output_feature_bn
        # (post-fc whitening) are both baked into this one Dense.
        x = nn.Dense(self.embedding_dim, dtype=self.dtype, name="output_fc")(x)
        if not self.folded:
            # Final BatchNorm1d(affine=False): running stats only.
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                use_bias=False, use_scale=False, dtype=self.dtype,
                name="output_feature_bn",
            )(x)

        x = x.astype(jnp.float32)
        norm = jnp.linalg.norm(x, axis=1, keepdims=True)
        feature = x / jnp.maximum(norm, 1e-12)
        return feature, norm


def build_backbone(
    architecture: str, dtype=jnp.float32, folded: bool = False,
    quantized: bool = False, fused_int8: bool = False,
    int8_fwd_train: bool = False,
) -> IRBackbone:
    """Factory mirroring the zoo's `net.build_model(arch)` naming.

    `folded=True` builds the inference-only structure whose variables come
    from `fold.fold_inference_variables` (BNs baked into convs/fc);
    `quantized=True` additionally swaps the two res convs of every unit for
    int8 QuantConvs whose variables come from
    `quantize.quantize_folded_variables`; `fused_int8=True` (requires
    quantized) uses the single-chain FusedQuantBody per unit, with
    variables from `quantize.fuse_quantized_params`."""
    if architecture not in BACKBONE_CONFIGS:
        raise ValueError(
            f"Unknown architecture: {architecture}. "
            f"Available: {sorted(BACKBONE_CONFIGS)}"
        )
    cfg = BACKBONE_CONFIGS[architecture]
    return IRBackbone(
        units=cfg["units"],
        use_se=cfg["use_se"],
        conv_shortcut=cfg.get("conv_shortcut", False),
        folded=folded,
        quantized=quantized,
        fused_int8=fused_int8,
        int8_fwd_train=int8_fwd_train,
        dtype=dtype,
    )
