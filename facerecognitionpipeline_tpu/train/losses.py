"""Margin-softmax losses for face-recognition training.

The reference consumes models *trained with* AdaFace/ArcFace margins but has
no training code of its own (checkpoints are read-only inputs,
`face_embedder.py:51-53`). A complete framework needs to produce those
checkpoints, so this module implements the margin family:

* ArcFace: additive angular margin, cos(theta + m)            [s=64, m=0.5]
* CosFace: additive cosine margin, cos(theta) - m             [s=64, m=0.4]
* AdaFace: norm-adaptive margin (Kim et al., CVPR 2022) — the feature norm
  proxies image quality; margin interpolates between angular and additive.

All functions are pure: (cosine row for the TARGET class only, plus scalars)
-> adjusted target cosine. They compose with the class-sharded partial-FC
cross-entropy in `trainer.py`, where only the label's logit gets the margin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7


def arcface_margin_cosine(cos_t: jax.Array, m: float = 0.5) -> jax.Array:
    """cos(theta + m) with the standard easy-margin-free fallback."""
    cos_t = jnp.clip(cos_t, -1 + _EPS, 1 - _EPS)
    sin_t = jnp.sqrt(1.0 - cos_t * cos_t)
    cos_m, sin_m = jnp.cos(m), jnp.sin(m)
    phi = cos_t * cos_m - sin_t * sin_m
    # where theta + m exceeds pi, fall back to the monotone linear surrogate
    threshold = jnp.cos(jnp.pi - m)
    return jnp.where(cos_t > threshold, phi, cos_t - m * jnp.sin(m))


def cosface_margin_cosine(cos_t: jax.Array, m: float = 0.4) -> jax.Array:
    return cos_t - m


def adaface_margin_cosine(
    cos_t: jax.Array,
    norms: jax.Array,
    norm_mean: jax.Array,
    norm_std: jax.Array,
    m: float = 0.4,
    h: float = 0.333,
) -> jax.Array:
    """AdaFace: margin adapts to the feature norm (image-quality proxy).

    cos_t [B] target-class cosines; norms [B] pre-normalization feature
    norms; norm_mean/std are (EMA) batch statistics of the norms.
    g in [-1, 1]: high-quality (large norm) -> more angular margin,
    low-quality -> additive penalty.
    """
    g = (norms - norm_mean) / (norm_std / h + _EPS)
    g = jax.lax.stop_gradient(jnp.clip(g, -1.0, 1.0))

    # angular part: cos(theta + g_angle), g_angle = -m * g
    g_angle = -m * g
    cos_c = jnp.clip(cos_t, -1 + _EPS, 1 - _EPS)
    theta = jnp.arccos(cos_c)
    phi = jnp.cos(jnp.clip(theta + g_angle, _EPS, jnp.pi - _EPS))

    # additive part: g_add = m * g + m
    return phi - (m * g + m)
