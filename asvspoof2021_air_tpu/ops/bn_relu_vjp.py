"""Recompute-VJP fused ReLU -> train-mode BatchNorm.

The train-step device trace (docs/PERFORMANCE.md "Train-step roofline")
shows the Res2 BN/ReLU/residual stage costing 3.70 ms forward in train
mode vs 0.58 ms in eval mode: autodiff materializes the normalized
activations and ReLU masks of every `conv -> relu -> batchnorm` site as
backward residuals (pure HBM traffic at <7% of MXU peak). A whole-graph
`jax.checkpoint` policy over conv/dot outputs was measured 13% SLOWER
(it recomputes entire segments); this module instead wraps exactly one
ReLU+BN pair in a `jax.custom_vjp` whose residuals are only the
pre-ReLU input and the per-channel batch statistics — the normalized
activations and masks are recomputed in the backward from the input the
convolution saves anyway. No Pallas needed: the forward math is plain
jnp that XLA fuses; the win comes purely from changing WHAT is saved.

Semantics replicate `flax.linen.BatchNorm` applied to `relu(x)` exactly
(fast variance max(0, E[r^2] - E[r]^2) in f32, normalization in f32,
see flax.linen.normalization._compute_stats/_normalize); the reference
pattern is torch's `self.bn(self.relu(x))`
(/root/reference/ecapa_tdnn.py:57-76).

Backward math (per channel c, N = B*T reduced elements, r = relu(x),
xhat = (r - mu) * rsqrt(var + eps)):
    dbeta  = sum(gy)
    dgamma = sum(gy * xhat)
    dxhat  = gy * gamma
    dr     = inv * (dxhat - mean(dxhat) - xhat * mean(dxhat * xhat))
    dx     = dr * [x > 0]
The (mu, var) outputs exist only to drive the running-stat update; the
bwd rule adds their analytic contributions (gmu/N, 2*gvar*(r-mu)/N) so
the rule stays a correct VJP even if someone differentiates through
them, but in the module they are consumed under stop_gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def relu_bn_train(x, scale, bias, eps):
    """y32, mu, var = batchnorm_train(relu(x)) with recompute residuals.

    x: (..., C) pre-ReLU activation, any float dtype (stats/normalize in
    f32 like flax). scale, bias: (C,) f32 (pass ones/zeros for
    use_scale/use_bias=False). Returns y32 (..., C) f32 — caller casts
    to the module's output dtype — and (mu, var) f32 batch stats of
    relu(x) for the running-average update.
    """
    y32, mu, var = _primal(x, scale, bias, eps)
    return y32, mu, var


def _reduce_axes(x):
    return tuple(range(x.ndim - 1))


def _primal(x, scale, bias, eps):
    axes = _reduce_axes(x)
    r = jax.nn.relu(x).astype(jnp.float32)
    mu = jnp.mean(r, axis=axes)
    mu2 = jnp.mean(r * r, axis=axes)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    inv = lax.rsqrt(var + eps)
    y32 = (r - mu) * (inv * scale) + bias
    return y32, mu, var


def _fwd(x, scale, bias, eps):
    y32, mu, var = _primal(x, scale, bias, eps)
    return (y32, mu, var), (x, mu, var, scale)


def _bwd(eps, res, cts):
    x, mu, var, scale = res
    gy, gmu, gvar = cts
    axes = _reduce_axes(x)
    n = 1
    for a in axes:
        n *= x.shape[a]

    r = jax.nn.relu(x).astype(jnp.float32)
    inv = lax.rsqrt(var + eps)
    xhat = (r - mu) * inv
    g = gy.astype(jnp.float32)

    dbeta = jnp.sum(g, axis=axes)
    dgamma = jnp.sum(g * xhat, axis=axes)
    dxhat = g * scale
    m1 = jnp.mean(dxhat, axis=axes)
    m2 = jnp.mean(dxhat * xhat, axis=axes)
    dr = inv * (dxhat - m1 - xhat * m2)
    # stat-output contributions (zero in the BatchNorm use: the running
    # update consumes them under stop_gradient)
    dr = dr + gmu / n + (2.0 / n) * gvar * (r - mu)
    dx = jnp.where(x > 0, dr, 0.0).astype(x.dtype)
    return dx, dgamma, dbeta


relu_bn_train.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_relu_train(x, scale, bias, eps):
    """y32, mu, var = relu(batchnorm_train(x)) — the pre-activation order
    (torch `relu(bn(x))`, /root/reference/model.py:60-75 ResNet blocks
    and /root/reference/model.py:260-288 SE-Res2Net) with the same
    recompute residuals: only (x, mu, var) are saved; the normalized
    activations and the ReLU mask are rebuilt in the backward."""
    y32, mu, var = _bn_relu_primal(x, scale, bias, eps)
    return y32, mu, var


def _bn_relu_primal(x, scale, bias, eps):
    axes = _reduce_axes(x)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=axes)
    mu2 = jnp.mean(xf * xf, axis=axes)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    inv = lax.rsqrt(var + eps)
    z = (xf - mu) * (inv * scale) + bias
    return jax.nn.relu(z), mu, var


def _bn_relu_fwd(x, scale, bias, eps):
    y32, mu, var = _bn_relu_primal(x, scale, bias, eps)
    return (y32, mu, var), (x, mu, var, scale, bias)


def _bn_relu_bwd(eps, res, cts):
    x, mu, var, scale, bias = res
    gy, gmu, gvar = cts
    axes = _reduce_axes(x)
    n = 1
    for a in axes:
        n *= x.shape[a]

    xf = x.astype(jnp.float32)
    inv = lax.rsqrt(var + eps)
    xhat = (xf - mu) * inv
    z = xhat * scale + bias
    g = jnp.where(z > 0, gy.astype(jnp.float32), 0.0)  # through the ReLU

    dbeta = jnp.sum(g, axis=axes)
    dgamma = jnp.sum(g * xhat, axis=axes)
    dxhat = g * scale
    m1 = jnp.mean(dxhat, axis=axes)
    m2 = jnp.mean(dxhat * xhat, axis=axes)
    dx32 = inv * (dxhat - m1 - xhat * m2)
    dx32 = dx32 + gmu / n + (2.0 / n) * gvar * (xf - mu)
    return dx32.astype(x.dtype), dgamma, dbeta


bn_relu_train.defvjp(_bn_relu_fwd, _bn_relu_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train(x, scale, bias, eps):
    """y32, mu, var = batchnorm_train(x), no activation (LCNN's affine-free
    norms after MFM/pool, /root/reference/model.py:567-585) — recompute
    residuals: only (x, mu, var) are saved, the normalized activations are
    rebuilt in the backward."""
    y32, mu, var = _bn_primal(x, scale, bias, eps)
    return y32, mu, var


def _bn_primal(x, scale, bias, eps):
    axes = _reduce_axes(x)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=axes)
    mu2 = jnp.mean(xf * xf, axis=axes)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    inv = lax.rsqrt(var + eps)
    return (xf - mu) * (inv * scale) + bias, mu, var


def _bn_fwd(x, scale, bias, eps):
    y32, mu, var = _bn_primal(x, scale, bias, eps)
    return (y32, mu, var), (x, mu, var, scale)


def _bn_bwd(eps, res, cts):
    x, mu, var, scale = res
    gy, gmu, gvar = cts
    axes = _reduce_axes(x)
    n = 1
    for a in axes:
        n *= x.shape[a]

    xf = x.astype(jnp.float32)
    inv = lax.rsqrt(var + eps)
    xhat = (xf - mu) * inv
    g = gy.astype(jnp.float32)

    dbeta = jnp.sum(g, axis=axes)
    dgamma = jnp.sum(g * xhat, axis=axes)
    dxhat = g * scale
    m1 = jnp.mean(dxhat, axis=axes)
    m2 = jnp.mean(dxhat * xhat, axis=axes)
    dx32 = inv * (dxhat - m1 - xhat * m2)
    dx32 = dx32 + gmu / n + (2.0 / n) * gvar * (xf - mu)
    return dx32.astype(x.dtype), dgamma, dbeta


bn_train.defvjp(_bn_fwd, _bn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_leaky_relu_train(x, scale, bias, eps, slope):
    """y32, mu, var = leaky_relu(batchnorm_train(x), slope) — ConvNet's
    block activation (/root/reference/model.py:625-648 leaky 0.1) with
    recompute residuals."""
    y32, mu, var = _bn_lrelu_primal(x, scale, bias, eps, slope)
    return y32, mu, var


def _bn_lrelu_primal(x, scale, bias, eps, slope):
    y32, mu, var = _bn_primal(x, scale, bias, eps)
    return jnp.where(y32 >= 0, y32, slope * y32), mu, var


def _bn_lrelu_fwd(x, scale, bias, eps, slope):
    y32, mu, var = _bn_lrelu_primal(x, scale, bias, eps, slope)
    return (y32, mu, var), (x, mu, var, scale, bias)


def _bn_lrelu_bwd(eps, slope, res, cts):
    x, mu, var, scale, bias = res
    gy, gmu, gvar = cts
    axes = _reduce_axes(x)
    n = 1
    for a in axes:
        n *= x.shape[a]

    xf = x.astype(jnp.float32)
    inv = lax.rsqrt(var + eps)
    xhat = (xf - mu) * inv
    z = xhat * scale + bias
    g = jnp.where(z >= 0, 1.0, slope) * gy.astype(jnp.float32)

    dbeta = jnp.sum(g, axis=axes)
    dgamma = jnp.sum(g * xhat, axis=axes)
    dxhat = g * scale
    m1 = jnp.mean(dxhat, axis=axes)
    m2 = jnp.mean(dxhat * xhat, axis=axes)
    dx32 = inv * (dxhat - m1 - xhat * m2)
    dx32 = dx32 + gmu / n + (2.0 / n) * gvar * (xf - mu)
    return dx32.astype(x.dtype), dgamma, dbeta


bn_leaky_relu_train.defvjp(_bn_lrelu_fwd, _bn_lrelu_bwd)
