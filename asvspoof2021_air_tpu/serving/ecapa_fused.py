"""ECAPA inference forward with the fused Pallas attention-pooling kernel.

Serving-only specialization of models/ecapa.py: the trunk (stem + three
SE-Res2 blocks + MFA) and head (BN + embedding/logit Dense + out-BN) run
as flax modules whose parameter names alias the trained ECAPA_TDNN tree
exactly, while the HBM-bound middle section (context attention + softmax
+ attentive statistics) runs as one Pallas kernel
(ops/attn_pool_pallas.py). Inference-only: training keeps the standard
XLA graph (the kernel has no VJP).

Parity with model.apply is pinned by tests/test_attn_pool_pallas.py; any
drift in the model's module naming breaks those tests loudly.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from asvspoof2021_air_tpu.models.common import BN_EPS, BN_MOMENTUM
from asvspoof2021_air_tpu.models.ecapa import Bottle2neck
from asvspoof2021_air_tpu.ops.attn_pool_pallas import fused_attention_pooling


def _bn(name, dtype):
    return nn.BatchNorm(use_running_average=True, momentum=BN_MOMENTUM,
                        epsilon=BN_EPS, dtype=dtype, name=name)


class _Trunk(nn.Module):
    """Stem + Bottle2neck x3 + MFA; parameter names alias ECAPA_TDNN."""

    C: int = 512
    model_scale: int = 8
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(self.C, (5,), padding=((2, 2),), dtype=self.dtype,
                    name="Conv_0")(x)
        x = nn.relu(x)
        x = _bn("BatchNorm_0", self.dtype)(x)

        blk = lambda d: Bottle2neck(self.C, 3, d, self.model_scale,
                                    dtype=self.dtype)
        x1 = blk(2)(x, False)
        x2 = blk(3)(x1, False)
        x3 = blk(4)(x2, False)

        C = self.C
        w4 = self.param(
            "mfa_kernel", nn.initializers.lecun_normal(), (3 * C, 1536)
        )
        b4 = self.param("mfa_bias", nn.initializers.zeros, (1536,))
        dt = self.dtype or x1.dtype
        x = (
            jnp.einsum("btc,cd->btd", x1, w4[:C].astype(dt))
            + jnp.einsum("btc,cd->btd", x2, w4[C:2 * C].astype(dt))
            + jnp.einsum("btc,cd->btd", x3, w4[2 * C:].astype(dt))
            + b4.astype(dt)
        )
        return nn.relu(x)


class _Head(nn.Module):
    """Post-pooling head; names alias the full model's BN/Dense modules."""

    enc_dim: int = 256
    n_out: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, pooled):
        x = pooled
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = _bn("BatchNorm_2", self.dtype)(x)
        feat = nn.Dense(self.enc_dim, dtype=self.dtype, name="Dense_0")(x)
        out = nn.Dense(self.n_out, dtype=self.dtype, name="Dense_1")(feat)
        out = _bn("BatchNorm_3", self.dtype)(out)
        return feat.astype(jnp.float32), out.astype(jnp.float32)


def ecapa_apply_fused(variables, feats, *, C: int = 512,
                      model_scale: int = 8, enc_dim: int = 256,
                      n_out: int = 2, dtype=None, interpret: bool = False):
    """(embedding, logits) for ECAPA inference with the fused pooling
    kernel, from the SAME variables tree a trained ECAPA_TDNN produced."""
    trunk = _Trunk(C=C, model_scale=model_scale, dtype=dtype)
    x = trunk.apply(variables, feats)
    p = variables["params"]
    bs = variables["batch_stats"]
    bn_vars = {
        "scale": p["BatchNorm_1"]["scale"],
        "bias": p["BatchNorm_1"]["bias"],
        "mean": bs["BatchNorm_1"]["mean"],
        "var": bs["BatchNorm_1"]["var"],
    }
    pooled = fused_attention_pooling(
        x, p["attn_kernel"], p["attn_bias"], bn_vars,
        p["Conv_1"]["kernel"], p["Conv_1"]["bias"], interpret=interpret,
    )
    head = _Head(enc_dim=enc_dim, n_out=n_out, dtype=dtype)
    return head.apply(variables, pooled)
