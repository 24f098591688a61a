"""Plain CNN baseline (capability of /root/reference/model.py:54-121):
four strided/dilated conv blocks with BatchNorm + LeakyReLU, optional
frequency-collapsing fifth block with self-attention pooling, dense head.
Returns (embedding, logits)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from asvspoof2021_air_tpu.models.common import (
    SelfAttentionPooling,
    batch_norm,
    to_2d_input,
)


class ConvNet(nn.Module):
    num_classes: int = 2
    num_nodes: int = 512
    enc_dim: int = 2
    subband_attention: bool = False
    fused_bn: bool = False  # bn+leaky_relu via the recompute-VJP (train)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = to_2d_input(x)

        specs = [
            (8, (5, 5), (1, 2), (1, 2), (2, 3)),
            (16, (5, 5), (1, 2), (1, 2), (2, 2)),
            (32, (5, 5), (1, 2), (1, 1), (2, 1)),
            (64, (3, 3), (1, 1), (1, 1), (1, 1)),
        ]
        for feats, kern, pad, dil, stride in specs:
            x = nn.Conv(feats, kern, strides=stride,
                        padding=((pad[0], pad[0]), (pad[1], pad[1])),
                        kernel_dilation=dil, use_bias=False)(x)
            x = batch_norm(train, relu_after=self.fused_bn,
                           leaky_slope=0.1 if self.fused_bn else None)(x)
            if not self.fused_bn:
                x = nn.leaky_relu(x, 0.1)

        if self.subband_attention:
            x = nn.Conv(128, (self.num_nodes, 3), padding=((0, 0), (1, 1)),
                        use_bias=False)(x)
            x = batch_norm(train, relu_after=self.fused_bn,
                           leaky_slope=0.1 if self.fused_bn else None)(x)
            if not self.fused_bn:
                x = nn.leaky_relu(x, 0.1)
            x = jnp.squeeze(x, axis=1)  # (B, T, 128)
            out = SelfAttentionPooling(128)(x)
        else:
            h = x.reshape((x.shape[0], -1))
            out = nn.Dense(256)(h)
        out1 = nn.Dense(self.enc_dim)(out)
        out = nn.Dense(self.num_classes)(out1)
        return out1, out
