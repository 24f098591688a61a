"""Fused Pallas kernel for ECAPA's context attentive-statistics pooling.

The unfused XLA graph makes several full HBM passes over the (B, T, 1536)
MFA activation (mean/std reduction, attention matmul, softmax, two
weighted-stat reductions) plus materializes the (B, T, 1536) attention
logits. This kernel keeps one batch row's activation resident in VMEM
(T x 1536 bf16 ~= 2.3 MB) and fuses the whole chain
(/root/reference/ecapa_tdnn.py:126-145,177-186 semantics as implemented in
models/ecapa.py):

    mean/std over T  ->  context bias  ->  relu(x@Wa + const + ba)
    -> folded-BN affine -> @Wb + bb -> softmax over T (per channel)
    -> attentive mu/sigma -> (B, 2D)

HBM traffic per row: read x once, write 2*D floats — the attention logits
never exist in HBM. Inference-only (no custom VJP); the training step
keeps the standard XLA graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from asvspoof2021_air_tpu.models.common import BN_EPS


def _kernel(x_ref, wax_ref, wam_ref, was_ref, ba_ref, scale_ref, bias_ref,
            wb_ref, bb_ref, out_ref, *, t_valid):
    x = x_ref[0].astype(jnp.float32)          # (Tpad, D)
    Tpad, D = x.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (Tpad, 1), 0)
    valid = (rows < t_valid).astype(jnp.float32)
    xv = x * valid

    n = jnp.float32(t_valid)
    mean = jnp.sum(xv, axis=0, keepdims=True) / n              # (1, D)
    ex2 = jnp.sum(xv * xv, axis=0, keepdims=True) / n
    var = (ex2 - mean * mean) * (n / (n - 1.0))                # ddof=1
    std = jnp.sqrt(jnp.clip(var, 1e-4))

    const = (
        jnp.dot(mean, wam_ref[...], preferred_element_type=jnp.float32)
        + jnp.dot(std, was_ref[...], preferred_element_type=jnp.float32)
    )                                                          # (1, 128)
    a = jnp.dot(x, wax_ref[...], preferred_element_type=jnp.float32)
    a = jnp.maximum(a + const + ba_ref[...], 0.0)
    a = a * scale_ref[...] + bias_ref[...]                     # folded BN
    logits = jnp.dot(a, wb_ref[...], preferred_element_type=jnp.float32)
    logits = logits + bb_ref[...]

    neg_inf = jnp.float32(-1e30)
    logits = jnp.where(valid > 0, logits, neg_inf)
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m) * valid
    w = e / jnp.sum(e, axis=0, keepdims=True)                  # (Tpad, D)

    mu = jnp.sum(xv * w, axis=0)                               # (D,)
    sg = jnp.sqrt(jnp.clip(jnp.sum(xv * xv * w, axis=0) - mu * mu, 1e-4))
    out_ref[0, 0, :D] = mu
    out_ref[0, 0, D:] = sg


@functools.partial(jax.jit, static_argnames=("interpret", "valid_len"))
def _run(x, wax, wam, was, ba, scale, bias, wb, bb, interpret=False,
         valid_len=None):
    B, T, D = x.shape
    Tpad = -(-T // 8) * 8
    if Tpad != T:
        x = jnp.pad(x, ((0, 0), (0, Tpad - T), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, t_valid=valid_len or T),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Tpad, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((D, 128), lambda b: (0, 0)),
            pl.BlockSpec((D, 128), lambda b: (0, 0)),
            pl.BlockSpec((D, 128), lambda b: (0, 0)),
            pl.BlockSpec((1, 128), lambda b: (0, 0)),
            pl.BlockSpec((1, 128), lambda b: (0, 0)),
            pl.BlockSpec((1, 128), lambda b: (0, 0)),
            pl.BlockSpec((128, D), lambda b: (0, 0)),
            pl.BlockSpec((1, D), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 2 * D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1, 2 * D), jnp.float32),
        interpret=interpret,
    )(x, wax, wam, was, ba, scale, bias, wb, bb)
    return out[:, 0, :]


def fused_attention_pooling(x, attn_kernel, attn_bias, bn_vars, conv_kernel,
                            conv_bias, interpret: bool = False,
                            valid_len: int | None = None):
    """x: (B, T, 1536) MFA output (post-relu). attn_kernel: (3*1536, 128)
    context attention kernel (models/ecapa.py layout: [x | mean | std]
    halves); bn_vars: the attention BatchNorm's inference variables
    {'scale','bias','mean','var'}; conv_kernel: (1, 128, 1536) or
    (128, 1536). Returns (B, 3072) = [mu || sigma], matching the model's
    f32 pooled statistics.

    ``valid_len``: semantic length when T carries alignment padding
    (frames >= valid_len are excluded from every statistic — the same
    in-kernel masking already used for the internal sublane pad)."""
    D = x.shape[-1]
    wax = attn_kernel[:D]
    wam = attn_kernel[D:2 * D]
    was = attn_kernel[2 * D:]
    gamma = bn_vars["scale"]
    beta = bn_vars["bias"]
    mean_r = bn_vars["mean"]
    var_r = bn_vars["var"]
    s = gamma * jax.lax.rsqrt(var_r + BN_EPS)
    b = beta - mean_r * s
    wb = conv_kernel.reshape(conv_kernel.shape[-2], conv_kernel.shape[-1])
    return _run(
        x,
        wax.astype(jnp.float32), wam.astype(jnp.float32),
        was.astype(jnp.float32),
        attn_bias.reshape(1, -1).astype(jnp.float32),
        s.reshape(1, -1).astype(jnp.float32),
        b.reshape(1, -1).astype(jnp.float32),
        wb.astype(jnp.float32),
        conv_bias.reshape(1, -1).astype(jnp.float32),
        interpret=interpret,
        valid_len=valid_len,
    )
