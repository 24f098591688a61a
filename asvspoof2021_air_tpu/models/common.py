"""Shared model building blocks: pooling, MFM activation, SE layers, inits."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch BatchNorm defaults: eps 1e-5, running-stat update weight 0.1
# (flax momentum = retained fraction = 0.9).
BN_MOMENTUM = 0.9
BN_EPS = 1e-5

conv_kaiming_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
linear_kaiming_init = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


class SelfAttentionPooling(nn.Module):
    """Attentive statistics pooling over time.

    Capability of the reference SelfAttention head
    (/root/reference/model.py:18-52): scalar attention logits per frame via a
    learned vector, softmax over tanh of the logits, attention-weighted sum
    and std concatenated to a 2*hidden vector. The reference regularizes the
    std with 1e-5 gaussian noise (model.py:44-48); here the noise is applied
    only when a 'noise' rng stream is provided (training), keeping inference
    deterministic.
    """

    hidden_size: int
    mean_only: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, T, H)
        att_w = self.param(
            "att_weights",
            nn.initializers.variance_scaling(2.0, "fan_in", "uniform"),
            (self.hidden_size, 1),
        )
        logits = jnp.einsum("bth,ho->bto", x, att_w)[..., 0]  # (B, T)
        attn = jax.nn.softmax(jnp.tanh(logits), axis=1)
        weighted = x * attn[..., None]
        mean = jnp.sum(weighted, axis=1)
        if self.mean_only:
            return mean
        if self.has_rng("noise"):
            noise = 1e-5 * jax.random.normal(self.make_rng("noise"), weighted.shape)
            weighted = weighted + noise
        # torch .std(dim) is the unbiased (ddof=1) estimator.
        std = jnp.std(weighted, axis=1, ddof=1)
        return jnp.concatenate([mean, std], axis=1)


class MaxFeatureMap(nn.Module):
    """Max-Feature-Map activation: pairwise max over channel halves
    (/root/reference/model.py:511-552). Operates on the last axis."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        if c % 2:
            raise ValueError("MaxFeatureMap needs an even channel count")
        a, b = jnp.split(x, 2, axis=-1)
        return jnp.maximum(a, b)


class SELayer2D(nn.Module):
    """Squeeze-and-excitation over (B, H, W, C)
    (/root/reference/model.py:492-509): global average pool, bottleneck MLP
    (no biases), sigmoid channel gates."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(self.channels // self.reduction, use_bias=False)(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False)(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class SEModule1D(nn.Module):
    """SE block over (B, T, C) with a BatchNorm'd bottleneck
    (/root/reference/ecapa_tdnn.py:15-29)."""

    channels: int
    bottleneck: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = jnp.mean(x, axis=1)
        y = nn.Dense(self.bottleneck, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype,
        )(y)
        y = nn.Dense(self.channels, dtype=self.dtype)(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, :]


def batch_norm(train: bool, dtype=None, **kwargs) -> nn.BatchNorm:
    """BatchNorm with torch-default hyperparameters.

    Under jit+GSPMD sharding the batch statistics are computed over the
    global (logical) batch, so data-parallel training gets synchronized BN
    without an axis_name.
    """
    return nn.BatchNorm(
        use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
        dtype=dtype, **kwargs
    )


def to_2d_input(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, F) features -> (B, F, T, 1) NHWC image with H=frequency,
    matching the reference 2D-model layout ((B, 1, 60, 750) NCHW after the
    transpose at /root/reference/main_train.py:338)."""
    if x.ndim == 4:  # already NHWC
        return x
    return jnp.transpose(x, (0, 2, 1))[..., None]
