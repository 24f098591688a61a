"""Differentiable fused softmax-weighted statistics pooling (Pallas).

The train-step device trace (docs/PERFORMANCE.md "Train-step roofline")
shows ECAPA's attention/pooling section costing ~4.3 ms/step: autodiff
materializes the (B, T, 1536) attention logits, the softmax weights, and
f32 copies of the MFA activation as backward residuals, and XLA provably
conserves that traffic whichever side of the boundary it lands on (the
attentive-stats restructure experiment moved 1 ms fwd->bwd with total
unchanged). This module beats it with a `jax.custom_vjp` whose forward
AND backward are Pallas kernels: the logits/softmax weights live only in
VMEM, recomputed in the backward from the tiny (B, T, 128) attention
hidden — flash-attention's trick applied to attentive pooling.

Fused section (models/ecapa.py attention tail; reference semantics
/root/reference/ecapa_tdnn.py:139-145,177-186):

    logits = h2 @ W2 + b2          # 1x1 conv 128 -> 1536
    w      = softmax_T(logits)     # per (batch, channel) over time
    mu_c   = sum_t w_tc x_tc
    e2_c   = sum_t w_tc x_tc^2     # sigma computed outside from (mu, e2)

Upstream (the attention einsum, relu, train-mode BatchNorm over the
128-wide hidden) stays in XLA: its tensors are 12x smaller and BN batch
stats need cross-batch reductions.

Backward math (per batch row and channel, t over valid frames):
    q_t  = g_mu x_t + g_e2 x_t^2
    S    = sum_t w_t q_t
    dlogits_t = w_t (q_t - S)
    dx_t = w_t (g_mu + 2 g_e2 x_t)
    dW2  = h2^T dlogits ;  dh2 = dlogits @ W2^T ;  db2 = 0
(db2 is exactly zero: softmax over T is invariant to the per-channel
bias, so the 1x1 conv bias never influences the pooled stats — true of
the reference graph as well.)

Channel tiles are independent (softmax normalizes over T per channel),
so the grid is (B, D/TILE) with parameter/hidden grads accumulated in
VMEM scratch and written on the final tile/row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D_TILE = 512


def _fwd_kernel(x_ref, h2_ref, w2_ref, b2_ref, mu_ref, e2_ref, *, t_valid):
    x = x_ref[0].astype(jnp.float32)              # (Tpad, DT)
    h2 = h2_ref[0].astype(jnp.float32)            # (Tpad, 128)
    Tpad = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (Tpad, 1), 0)
    valid = (rows < t_valid).astype(jnp.float32)

    logits = jnp.dot(h2, w2_ref[...], preferred_element_type=jnp.float32)
    logits = logits + b2_ref[...]
    logits = jnp.where(valid > 0, logits, jnp.float32(-1e30))
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m) * valid
    w = e / jnp.sum(e, axis=0, keepdims=True)     # (Tpad, DT)

    xv = x * valid
    mu_ref[0, 0, :] = jnp.sum(xv * w, axis=0)
    e2_ref[0, 0, :] = jnp.sum(xv * xv * w, axis=0)


def _bwd_kernel(x_ref, h2_ref, w2_ref, b2_ref, gmu_ref, ge2_ref,
                dx_ref, dh2_ref, dw2_ref,
                dh2_acc, dw2_acc, *, t_valid, nd):
    jd = pl.program_id(1)
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    x = x_ref[0].astype(jnp.float32)
    h2 = h2_ref[0].astype(jnp.float32)
    w2 = w2_ref[...]                               # (128, DT) f32
    Tpad = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (Tpad, 1), 0)
    valid = (rows < t_valid).astype(jnp.float32)

    logits = jnp.dot(h2, w2, preferred_element_type=jnp.float32)
    logits = logits + b2_ref[...]
    logits = jnp.where(valid > 0, logits, jnp.float32(-1e30))
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m) * valid
    w = e / jnp.sum(e, axis=0, keepdims=True)

    xv = x * valid
    gmu = gmu_ref[0]                               # (1, DT)
    ge2 = ge2_ref[0]
    q = gmu * xv + ge2 * (xv * xv)
    s = jnp.sum(w * q, axis=0, keepdims=True)
    dlog = w * (q - s)                             # (Tpad, DT)

    dx_ref[0] = (w * (gmu + 2.0 * ge2 * xv)).astype(dx_ref.dtype)

    # dh2 accumulates over channel tiles (jd inner); dW2 over everything.
    @pl.when(jd == 0)
    def _():
        dh2_acc[...] = jnp.zeros_like(dh2_acc)

    @pl.when(jnp.logical_and(b == 0, jd == 0))
    def _():
        dw2_acc[...] = jnp.zeros_like(dw2_acc)

    dh2_acc[...] += jnp.dot(dlog, w2.T, preferred_element_type=jnp.float32)
    dw2_acc[:, pl.ds(jd * D_TILE, D_TILE)] += jnp.dot(
        h2.T, dlog, preferred_element_type=jnp.float32)

    @pl.when(jd == nd - 1)
    def _():
        dh2_ref[0] = (dh2_acc[...] * valid).astype(dh2_ref.dtype)

    @pl.when(b == nb - 1)
    def _():
        dw2_ref[...] = dw2_acc[:, pl.ds(jd * D_TILE, D_TILE)]


def _pad_t(a):
    T = a.shape[1]
    Tpad = -(-T // 8) * 8
    if Tpad != T:
        a = jnp.pad(a, ((0, 0), (0, Tpad - T), (0, 0)))
    return a, Tpad


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_softmax_stats(interpret, x, h2, w2, b2):
    """(mu, e2) attentive statistics, differentiable.

    x: (B, T, D) activation being pooled (any float dtype).
    h2: (B, T, 128) post-BN attention hidden.
    w2: (128, D) f32 1x1-conv kernel;  b2: (D,) f32 bias (no gradient —
    softmax over T cancels it exactly).
    Returns mu, e2: (B, D) f32; sigma = sqrt(clip(e2 - mu^2, eps))
    belongs to the caller so its autodiff stays standard.
    """
    mu, e2, _ = _fwd_impl(interpret, x, h2, w2, b2)
    return mu, e2


def _fwd_impl(interpret, x, h2, w2, b2):
    B, T, D = x.shape
    assert D % D_TILE == 0, D
    nd = D // D_TILE
    xp, Tpad = _pad_t(x)
    h2p, _ = _pad_t(h2)
    mu, e2 = pl.pallas_call(
        functools.partial(_fwd_kernel, t_valid=T),
        grid=(B, nd),
        in_specs=[
            pl.BlockSpec((1, Tpad, D_TILE), lambda b, jd: (b, 0, jd)),
            pl.BlockSpec((1, Tpad, h2.shape[-1]), lambda b, jd: (b, 0, 0)),
            pl.BlockSpec((h2.shape[-1], D_TILE), lambda b, jd: (0, jd)),
            pl.BlockSpec((1, D_TILE), lambda b, jd: (0, jd)),
        ],
        out_specs=[
            # (B, 1, D) with (1, 1, D_TILE) blocks: Mosaic requires the
            # last two block dims be (/8, /128) or equal to the array's —
            # the singleton middle axis satisfies that for per-row tiles.
            pl.BlockSpec((1, 1, D_TILE), lambda b, jd: (b, 0, jd)),
            pl.BlockSpec((1, 1, D_TILE), lambda b, jd: (b, 0, jd)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
        ],
        interpret=interpret,
    )(xp, h2p, w2, b2.reshape(1, -1))
    return mu[:, 0], e2[:, 0], (x, h2, w2, b2)


def _fwd_rule(interpret, x, h2, w2, b2):
    mu, e2, res = _fwd_impl(interpret, x, h2, w2, b2)
    return (mu, e2), res


def _bwd_rule(interpret, res, g):
    x, h2, w2, b2 = res
    gmu, ge2 = g
    B, T, D = x.shape
    H = h2.shape[-1]
    nd = D // D_TILE
    xp, Tpad = _pad_t(x)
    h2p, _ = _pad_t(h2)
    dx, dh2, dw2 = pl.pallas_call(
        functools.partial(_bwd_kernel, t_valid=T, nd=nd),
        grid=(B, nd),
        in_specs=[
            pl.BlockSpec((1, Tpad, D_TILE), lambda b, jd: (b, 0, jd)),
            pl.BlockSpec((1, Tpad, H), lambda b, jd: (b, 0, 0)),
            pl.BlockSpec((H, D_TILE), lambda b, jd: (0, jd)),
            pl.BlockSpec((1, D_TILE), lambda b, jd: (0, jd)),
            pl.BlockSpec((1, 1, D_TILE), lambda b, jd: (b, 0, jd)),
            pl.BlockSpec((1, 1, D_TILE), lambda b, jd: (b, 0, jd)),
        ],
        out_specs=[
            pl.BlockSpec((1, Tpad, D_TILE), lambda b, jd: (b, 0, jd)),
            pl.BlockSpec((1, Tpad, H), lambda b, jd: (b, 0, 0)),
            pl.BlockSpec((H, D_TILE), lambda b, jd: (0, jd)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tpad, D), x.dtype),
            jax.ShapeDtypeStruct((B, Tpad, H), h2.dtype),
            jax.ShapeDtypeStruct((H, D), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Tpad, H), jnp.float32),
            pltpu.VMEM((H, D), jnp.float32),
        ],
        interpret=interpret,
    )(xp, h2p, w2, b2.reshape(1, -1),
      gmu[:, None, :], ge2[:, None, :])
    return (dx[:, :T], dh2[:, :T], dw2, jnp.zeros_like(b2))


fused_softmax_stats.defvjp(_fwd_rule, _bwd_rule)
