"""ECAPA-TDNN: 1-D SE-Res2Blocks with context-aware attentive statistics
pooling — the reference's primary paper system.

Capability map (against /root/reference/ecapa_tdnn.py):
- stem conv k=5 F->C with conv->relu->BN ordering (:159-161)
- three Bottle2neck layers, kernel 3, dilations 2/3/4, scale 8 (:115-117)
- hierarchical split-conv ("Res2") groups with SE gating (:64-95)
- multi-layer feature aggregation cat -> 1x1 conv to 1536 (:118,172)
- context attentive-stats pooling: attention over cat(x, mean, std) (:177-186)
- BN -> 3072->256 embedding -> 256->nOut logits -> BN (:189-197)

Layout: (B, T, C) channels-last; every 1-D conv is a time-major conv that
XLA lowers to MXU matmuls.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from asvspoof2021_air_tpu.models.common import SEModule1D, batch_norm, relu_bn
from asvspoof2021_air_tpu.ops.attn_pool_vjp import fused_softmax_stats


class _Conv1x1Params(nn.Module):
    """Parameter holder matching nn.Conv's variable tree exactly
    (kernel (1, in, out) lecun_normal, bias zeros) so the fused pooling
    path below shares checkpoints/transplants with the standard path."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _ConvKParams(nn.Module):
    """Parameter holder matching nn.Conv's tree for a k-tap conv."""

    ksize: int
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.ksize, self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _ChainBNParams(nn.Module):
    """Parameter/stats holder matching models.common.BatchNorm's tree.

    Call once with no stats to declare and fetch (scale, bias); call
    again with the fused kernel's batch (mu, var) to apply the
    running-average update."""

    features: int
    momentum: float

    @nn.compact
    def __call__(self, mu=None, var=None):
        f = self.features
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((f,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((f,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        if mu is not None and not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value \
                + (1 - m) * jax.lax.stop_gradient(mu)
            ra_var.value = m * ra_var.value \
                + (1 - m) * jax.lax.stop_gradient(var)
        return scale, bias


class Bottle2neck(nn.Module):
    """SE-Res2 block (/root/reference/ecapa_tdnn.py:31-95)."""

    planes: int
    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8
    dtype: Optional[Any] = None
    fused_bn: bool = False   # relu+BN via the recompute-VJP (train mode)
    fused_chain: bool = False  # whole conv chain via the batched-bwd VJP

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(math.floor(self.planes / self.scale))
        residual = x

        out = nn.Conv(width * self.scale, (1,), dtype=self.dtype,
                      name="Conv_0")(x)
        out = relu_bn(out, train, self.dtype, fused=self.fused_bn,
                      name="BatchNorm_0")

        if self.fused_chain and train and self.kernel_size == 3:
            # whole chain through the custom-VJP op: sequential forward,
            # batched weight gradients + recompute BN backward
            # (ops/res2_chain_vjp.py). Parameter/stat trees match the
            # unfused path exactly (same names, shapes, inits).
            from asvspoof2021_air_tpu.models.common import (
                BN_EPS, BN_MOMENTUM)
            from asvspoof2021_air_tpu.ops.res2_chain_vjp import (
                res2_chain_train)
            ks, cbs, ss, bbs, bns = [], [], [], [], []
            for i in range(1, self.scale):
                k, cb = _ConvKParams(self.kernel_size, width, width,
                                     name=f"Conv_{i}")()
                bn = _ChainBNParams(width, BN_MOMENTUM,
                                    name=f"BatchNorm_{i}")
                s, b = bn()
                ks.append(k)
                cbs.append(cb)
                ss.append(s)
                bbs.append(b)
                bns.append(bn)
            out, mus, vrs = res2_chain_train(
                out, jnp.stack(ks), jnp.stack(cbs), jnp.stack(ss),
                jnp.stack(bbs), self.dilation, BN_EPS)
            for i, bn in enumerate(bns):
                bn(mus[i], vrs[i])
        else:
            groups = jnp.split(out, self.scale, axis=-1)
            pad = (self.kernel_size // 2) * self.dilation
            outs = []
            sp = None
            for i in range(self.scale - 1):
                sp = groups[i] if i == 0 else sp + groups[i]
                sp = nn.Conv(
                    width, (self.kernel_size,),
                    kernel_dilation=(self.dilation,),
                    padding=((pad, pad),), dtype=self.dtype,
                    name=f"Conv_{i + 1}",
                )(sp)
                sp = relu_bn(sp, train, self.dtype, fused=self.fused_bn,
                             name=f"BatchNorm_{i + 1}")
                outs.append(sp)
            outs.append(groups[-1])
            # NOTE: splitting this 1x1 conv over the groups (avoiding the
            # concat) was measured SLOWER — eight K=64 matmuls lose more
            # MXU efficiency than the concat costs; XLA fuses this concat
            # well.
            out = jnp.concatenate(outs, axis=-1)

        out = nn.Conv(self.planes, (1,), dtype=self.dtype,
                      name=f"Conv_{self.scale}")(out)
        out = relu_bn(out, train, self.dtype, fused=self.fused_bn,
                      name=f"BatchNorm_{self.scale}")
        out = SEModule1D(self.planes, dtype=self.dtype)(out, train)
        return out + residual


class ECAPA_TDNN(nn.Module):
    """Res2Net2 equivalent (/root/reference/ecapa_tdnn.py:97-198).

    Canonical instantiation: C=512, model_scale=8, n_out=2, n_feat=60
    (/root/reference/main_train.py:166-168).
    """

    C: int = 512
    model_scale: int = 8
    n_out: int = 2
    n_feat: int = 60
    enc_dim: int = 256
    context: bool = True
    summed: bool = False
    encoder_type: str = "ECA"
    out_bn: bool = True
    dtype: Optional[Any] = None   # compute dtype (e.g. jnp.bfloat16); params stay f32
    # fused_pool: run the attention tail (1x1 conv -> softmax_T -> weighted
    # stats) through the differentiable Pallas kernel (ops/attn_pool_vjp):
    # same math and SAME parameter tree, but the (B, T, 1536) logits and
    # softmax weights never reach HBM in either direction — the train
    # trace showed autodiff residuals for this section costing ~4 ms/step
    # (docs/PERFORMANCE.md). pool_interpret runs the kernel in interpret
    # mode (CPU tests).
    fused_pool: bool = False
    pool_interpret: bool = False
    # fused_bn: run every relu->batchnorm pair through the recompute-VJP
    # (ops/bn_relu_vjp): identical math and variable tree, but train-mode
    # autodiff saves only the conv outputs + batch stats instead of the
    # normalized activations and ReLU masks (docs/PERFORMANCE.md).
    fused_bn: bool = False
    # fused_chain: run each Bottle2neck's 7-conv hierarchical chain
    # through the custom-VJP op with batched weight gradients
    # (ops/res2_chain_vjp.py); train-mode only, same variable tree.
    fused_chain: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # x: (B, T, F)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(self.C, (5,), padding=((2, 2),), dtype=self.dtype)(x)
        x = relu_bn(x, train, self.dtype, fused=self.fused_bn)

        blk = lambda d: Bottle2neck(self.C, 3, d, self.model_scale,
                                    dtype=self.dtype,
                                    fused_bn=self.fused_bn,
                                    fused_chain=self.fused_chain)
        if self.summed:
            x1 = blk(2)(x, train)
            x2 = blk(3)(x + x1, train)
            x3 = blk(4)(x + x1 + x2, train)
        else:
            x1 = blk(2)(x, train)
            x2 = blk(3)(x1, train)
            x3 = blk(4)(x2, train)

        # MFA 1x1 conv over cat(x1,x2,x3), computed as a split matmul so the
        # (B, T, 3C) concatenation never materializes in HBM:
        # conv(cat(a,b,c), W) == a@W[:C] + b@W[C:2C] + c@W[2C:].
        C = self.C
        w4 = self.param(
            "mfa_kernel", nn.initializers.lecun_normal(), (3 * C, 1536)
        )
        b4 = self.param("mfa_bias", nn.initializers.zeros, (1536,))
        dt = self.dtype or x1.dtype
        # named_scope markers carry through to HLO op metadata so device
        # profiles (tools/perf/trace_roofline.py) can attribute fusions
        # to pipeline stages; they do not change the computation.
        with jax.named_scope("mfa"):
            x = (
                jnp.einsum("btc,cd->btd", x1, w4[:C].astype(dt))
                + jnp.einsum("btc,cd->btd", x2, w4[C:2 * C].astype(dt))
                + jnp.einsum("btc,cd->btd", x3, w4[2 * C:].astype(dt))
                + b4.astype(dt)
            )
            x = nn.relu(x)

        T = x.shape[1]
        attn_output = 1536 if self.encoder_type == "ECA" else 1
        wa = self.param(
            "attn_kernel", nn.initializers.lecun_normal(),
            ((3 * 1536) if self.context else 1536, 128),
        )
        ba = self.param("attn_bias", nn.initializers.zeros, (128,))
        with jax.named_scope("context_attention"):
            if self.context:
                # context attention over cat(x, mean, std): the mean/std
                # halves of the kernel act on time-constant rows, so the
                # (B, T, 4608) concat + broadcast collapses to one matmul
                # over x plus a tiny per-utterance bias term.
                mean = jnp.mean(x, axis=1)                          # (B, 1536)
                std = jnp.sqrt(jnp.clip(jnp.var(x, axis=1, ddof=1), 1e-4))
                const = (
                    mean.astype(dt) @ wa[1536:3072].astype(dt)
                    + std.astype(dt) @ wa[3072:].astype(dt)
                )                                                   # (B, 128)
                w = (
                    jnp.einsum("btc,cd->btd", x, wa[:1536].astype(dt))
                    + const[:, None, :] + ba.astype(dt)
                )
            else:
                w = jnp.einsum("btc,cd->btd", x, wa.astype(dt)) + ba.astype(dt)
            w = relu_bn(w, train, self.dtype, fused=self.fused_bn)
            use_fused = self.fused_pool and attn_output == 1536
            if not use_fused:
                w = nn.Conv(attn_output, (1,), dtype=self.dtype)(w)
                w = nn.softmax(w.astype(jnp.float32), axis=1).astype(w.dtype)

        with jax.named_scope("attentive_stats"):
            if use_fused:
                k2, b2 = _Conv1x1Params(128, attn_output, name="Conv_1")()
                mu, e2 = fused_softmax_stats(
                    self.pool_interpret, x, w,
                    k2[0].astype(jnp.float32), b2.astype(jnp.float32))
                sg = jnp.sqrt(jnp.clip(e2 - mu ** 2, 1e-4))
            else:
                # attentive statistics accumulate in f32 (sums over T)
                xf = x.astype(jnp.float32)
                wf = w.astype(jnp.float32)
                mu = jnp.sum(xf * wf, axis=1)
                sg = jnp.sqrt(
                    jnp.clip(jnp.sum((xf ** 2) * wf, axis=1) - mu ** 2,
                             1e-4))

            x = jnp.concatenate([mu, sg], axis=1)  # (B, 3072)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = batch_norm(train, self.dtype)(x)
        feat = nn.Dense(self.enc_dim, dtype=self.dtype)(x)
        out = nn.Dense(self.n_out, dtype=self.dtype)(feat)
        if self.out_bn:
            out = batch_norm(train, self.dtype)(out)
        # embedding/logits leave the model in f32 (score math, losses)
        return feat.astype(jnp.float32), out.astype(jnp.float32)
