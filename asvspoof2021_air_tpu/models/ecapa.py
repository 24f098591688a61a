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
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from asvspoof2021_air_tpu.models.common import SEModule1D, batch_norm


class Bottle2neck(nn.Module):
    """SE-Res2 block (/root/reference/ecapa_tdnn.py:31-95)."""

    planes: int
    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(math.floor(self.planes / self.scale))
        residual = x

        out = nn.Conv(width * self.scale, (1,))(x)
        out = nn.relu(out)
        out = batch_norm(train)(out)

        groups = jnp.split(out, self.scale, axis=-1)
        pad = (self.kernel_size // 2) * self.dilation
        outs = []
        sp = None
        for i in range(self.scale - 1):
            sp = groups[i] if i == 0 else sp + groups[i]
            sp = nn.Conv(
                width, (self.kernel_size,), kernel_dilation=(self.dilation,),
                padding=((pad, pad),),
            )(sp)
            sp = nn.relu(sp)
            sp = batch_norm(train)(sp)
            outs.append(sp)
        outs.append(groups[-1])
        out = jnp.concatenate(outs, axis=-1)

        out = nn.Conv(self.planes, (1,))(out)
        out = nn.relu(out)
        out = batch_norm(train)(out)
        out = SEModule1D(self.planes)(out, train)
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

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # x: (B, T, F)
        x = nn.Conv(self.C, (5,), padding=((2, 2),))(x)
        x = nn.relu(x)
        x = batch_norm(train)(x)

        if self.summed:
            x1 = Bottle2neck(self.C, 3, 2, self.model_scale)(x, train)
            x2 = Bottle2neck(self.C, 3, 3, self.model_scale)(x + x1, train)
            x3 = Bottle2neck(self.C, 3, 4, self.model_scale)(x + x1 + x2, train)
        else:
            x1 = Bottle2neck(self.C, 3, 2, self.model_scale)(x, train)
            x2 = Bottle2neck(self.C, 3, 3, self.model_scale)(x1, train)
            x3 = Bottle2neck(self.C, 3, 4, self.model_scale)(x2, train)

        x = nn.Conv(1536, (1,))(jnp.concatenate([x1, x2, x3], axis=-1))
        x = nn.relu(x)

        T = x.shape[1]
        if self.context:
            mean = jnp.mean(x, axis=1, keepdims=True)
            std = jnp.sqrt(jnp.clip(jnp.var(x, axis=1, ddof=1, keepdims=True), 1e-4))
            global_x = jnp.concatenate(
                [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)],
                axis=-1,
            )
        else:
            global_x = x

        attn_output = 1536 if self.encoder_type == "ECA" else 1
        w = nn.Conv(128, (1,))(global_x)
        w = nn.relu(w)
        w = batch_norm(train)(w)
        w = nn.Conv(attn_output, (1,))(w)
        w = nn.softmax(w, axis=1)  # softmax over time

        mu = jnp.sum(x * w, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum((x ** 2) * w, axis=1) - mu ** 2, 1e-4))

        x = jnp.concatenate([mu, sg], axis=1)  # (B, 3072)
        x = batch_norm(train)(x)
        feat = nn.Dense(self.enc_dim)(x)
        out = nn.Dense(self.n_out)(feat)
        if self.out_bn:
            out = batch_norm(train)(out)
        return feat, out
