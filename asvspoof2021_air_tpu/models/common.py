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


class BatchNorm(nn.Module):
    """Drop-in replacement for `flax.linen.BatchNorm` (same variable tree
    — auto-name prefix "BatchNorm", params scale/bias, batch_stats
    mean/var — and same numerics: f32 fast-variance stats, f32
    normalization, output cast like flax's canonicalize_dtype; exactness
    vs nn.BatchNorm is pinned by tests/test_bn_relu_vjp.py) with one
    addition: `fuse_relu=True` takes the PRE-ReLU activation and runs
    relu+BN through the recompute-VJP of ops/bn_relu_vjp in train mode,
    so the normalized activations and ReLU masks are never stored as
    backward residuals (docs/PERFORMANCE.md "Train-step roofline")."""

    use_running_average: bool = False
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: Optional[jnp.dtype] = None
    use_scale: bool = True
    use_bias: bool = True
    fuse_relu: bool = False    # input is pre-ReLU: y = bn(relu(x))
    relu_after: bool = False   # pre-activation order: y = relu(bn(x))
    recompute: bool = False    # plain BN with recompute-VJP residuals
    leaky_slope: Optional[float] = None  # with relu_after: leaky slope

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from asvspoof2021_air_tpu.ops.bn_relu_vjp import (
            bn_leaky_relu_train,
            bn_relu_train,
            bn_train,
            relu_bn_train,
        )

        assert self.fuse_relu + self.relu_after + self.recompute <= 1

        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32))
        scale = (self.param("scale", nn.initializers.ones, (feat,),
                            jnp.float32) if self.use_scale
                 else jnp.ones((feat,), jnp.float32))
        bias = (self.param("bias", nn.initializers.zeros, (feat,),
                           jnp.float32) if self.use_bias
                else jnp.zeros((feat,), jnp.float32))

        if self.use_running_average:
            r = nn.relu(x) if self.fuse_relu else x
            mu, var = ra_mean.value, ra_var.value
            y32 = (r.astype(jnp.float32) - mu) \
                * (jax.lax.rsqrt(var + self.epsilon) * scale) + bias
            if self.relu_after:
                y32 = (nn.leaky_relu(y32, self.leaky_slope)
                       if self.leaky_slope is not None else nn.relu(y32))
        elif self.fuse_relu:
            y32, mu, var = relu_bn_train(x, scale, bias, self.epsilon)
        elif self.relu_after and self.leaky_slope is not None:
            y32, mu, var = bn_leaky_relu_train(x, scale, bias, self.epsilon,
                                               self.leaky_slope)
        elif self.relu_after:
            y32, mu, var = bn_relu_train(x, scale, bias, self.epsilon)
        elif self.recompute:
            y32, mu, var = bn_train(x, scale, bias, self.epsilon)
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=axes)
            var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=axes) - mu * mu)
            y32 = (xf - mu) * (jax.lax.rsqrt(var + self.epsilon) * scale) \
                + bias
        if not self.use_running_average and not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value \
                + (1 - m) * jax.lax.stop_gradient(mu)
            ra_var.value = m * ra_var.value \
                + (1 - m) * jax.lax.stop_gradient(var)
        # flax: canonicalize_dtype(x, scale, bias, dtype=self.dtype) —
        # f32 params mean the default (dtype=None) output is f32.
        out_dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        return y32.astype(out_dtype)


def batch_norm(train: bool, dtype=None, **kwargs) -> BatchNorm:
    """BatchNorm with torch-default hyperparameters.

    Under jit+GSPMD sharding the batch statistics are computed over the
    global (logical) batch, so data-parallel training gets synchronized BN
    without an axis_name.
    """
    return BatchNorm(
        use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
        dtype=dtype, **kwargs
    )


def relu_bn(x: jnp.ndarray, train: bool, dtype=None,
            fused: bool = False, name: Optional[str] = None) -> jnp.ndarray:
    """The `relu -> batchnorm` pattern (torch `bn(relu(x))`,
    /root/reference/ecapa_tdnn.py:57-76). `fused=True` routes through
    the recompute-VJP train path (ops/bn_relu_vjp); identical math and
    variable tree either way. ``name`` pins the BatchNorm child's name
    when the caller's branch structure would shift auto-numbering."""
    bn = batch_norm(train, dtype, fuse_relu=fused, name=name)
    return bn(x if fused else nn.relu(x))


def bn_relu(x: jnp.ndarray, train: bool, dtype=None,
            fused: bool = False) -> jnp.ndarray:
    """The pre-activation `batchnorm -> relu` pattern (torch
    `relu(bn(x))`, /root/reference/model.py:60-75). `fused=True` routes
    through the recompute-VJP train path (ops/bn_relu_vjp.bn_relu_train);
    identical math and variable tree either way."""
    bn = batch_norm(train, dtype, relu_after=fused)
    out = bn(x)
    return out if fused else nn.relu(out)


def to_2d_input(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, F) features -> (B, F, T, 1) NHWC image with H=frequency,
    matching the reference 2D-model layout ((B, 1, 60, 750) NCHW after the
    transpose at /root/reference/main_train.py:338)."""
    if x.ndim == 4:  # already NHWC
        return x
    return jnp.transpose(x, (0, 2, 1))[..., None]
