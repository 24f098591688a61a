"""Pre-activation ResNet spectral embedding model.

Capabilities of the reference ResNet (/root/reference/model.py:123-253):
(9,3)/(3,1) stem over the freq x time plane, four pre-activation stages at
64/128/256/512 channels, a frequency-collapsing conv, self-attentive
statistics pooling over time, and an embedding + classification head.
Returns (embedding, logits).

NHWC layout throughout (XLA-native); H is the frequency axis.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Type

import jax.numpy as jnp
from flax import linen as nn

from asvspoof2021_air_tpu.models.common import (
    SelfAttentionPooling,
    bn_relu,
    conv_kaiming_init,
    linear_kaiming_init,
    to_2d_input,
)


class PreActBlock(nn.Module):
    """Pre-activation basic block (/root/reference/model.py:123-143)."""

    planes: int
    stride: int = 1
    dtype: Optional[Any] = None
    fused_bn: bool = False   # bn+relu via the recompute-VJP (train mode)
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        out = bn_relu(x, train, self.dtype, fused=self.fused_bn)
        needs_proj = self.stride != 1 or in_planes != self.expansion * self.planes
        shortcut = (
            nn.Conv(
                self.expansion * self.planes, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                kernel_init=conv_kaiming_init, dtype=self.dtype,
            )(out)
            if needs_proj
            else x
        )
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False,
            kernel_init=conv_kaiming_init, dtype=self.dtype,
        )(out)
        out = nn.Conv(
            self.planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            kernel_init=conv_kaiming_init, dtype=self.dtype,
        )(bn_relu(out, train, self.dtype, fused=self.fused_bn))
        return out + shortcut


class PreActBottleneck(nn.Module):
    """Pre-activation bottleneck block (/root/reference/model.py:146-169)."""

    planes: int
    stride: int = 1
    dtype: Optional[Any] = None
    fused_bn: bool = False   # bn+relu via the recompute-VJP (train mode)
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        out = bn_relu(x, train, self.dtype, fused=self.fused_bn)
        needs_proj = self.stride != 1 or in_planes != self.expansion * self.planes
        shortcut = (
            nn.Conv(
                self.expansion * self.planes, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                kernel_init=conv_kaiming_init, dtype=self.dtype,
            )(out)
            if needs_proj
            else x
        )
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=conv_kaiming_init, dtype=self.dtype)(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False,
            kernel_init=conv_kaiming_init, dtype=self.dtype,
        )(bn_relu(out, train, self.dtype, fused=self.fused_bn))
        out = nn.Conv(self.expansion * self.planes, (1, 1), use_bias=False,
                      kernel_init=conv_kaiming_init, dtype=self.dtype)(
                          bn_relu(out, train, self.dtype,
                                  fused=self.fused_bn))
        return out + shortcut


RESNET_CONFIGS = {
    "18": ([2, 2, 2, 2], PreActBlock),
    "28": ([3, 4, 6, 3], PreActBlock),
    "34": ([3, 4, 6, 3], PreActBlock),
    "50": ([3, 4, 6, 3], PreActBottleneck),
    "101": ([3, 4, 23, 3], PreActBottleneck),
}


class ResNet(nn.Module):
    """Spectral ResNet with attentive-stats pooling
    (/root/reference/model.py:184-253).

    num_nodes is the residual frequency extent entering conv5 (3 for 60-dim
    LFCC through the (9,3)/(3,1) stem and three stride-2 stages,
    cf. /root/reference/main_train.py:162-163).
    """

    num_nodes: int = 3
    enc_dim: int = 256
    resnet_type: str = "18"
    nclasses: int = 2
    dtype: Optional[Any] = None   # compute dtype; params stay f32
    fused_bn: bool = False        # bn+relu via the recompute-VJP (train)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        layers, block = RESNET_CONFIGS[self.resnet_type]
        x = to_2d_input(x)  # (B, F, T, 1)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        x = nn.Conv(16, (9, 3), strides=(3, 1), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=conv_kaiming_init,
                    dtype=self.dtype)(x)
        x = bn_relu(x, train, self.dtype, fused=self.fused_bn)

        for planes, n_blocks, stride in zip(
            (64, 128, 256, 512), layers, (1, 2, 2, 2)
        ):
            x = block(planes, stride, self.dtype,
                      fused_bn=self.fused_bn)(x, train)
            for _ in range(1, n_blocks):
                x = block(planes, 1, self.dtype,
                          fused_bn=self.fused_bn)(x, train)

        x = nn.Conv(256, (self.num_nodes, 3), padding=((0, 0), (1, 1)),
                    use_bias=False, kernel_init=conv_kaiming_init,
                    dtype=self.dtype)(x)
        x = bn_relu(x, train, self.dtype, fused=self.fused_bn)
        x = jnp.squeeze(x, axis=1)  # (B, T', 256)

        # attentive stats pool in f32 (sums over time)
        stats = SelfAttentionPooling(256)(x.astype(jnp.float32))  # (B, 512)
        feat = nn.Dense(self.enc_dim, kernel_init=linear_kaiming_init)(stats)
        out_dim = self.nclasses if self.nclasses >= 2 else 1
        mu = nn.Dense(out_dim, kernel_init=linear_kaiming_init)(feat)
        return feat, mu
