"""SE-Res2Net50 (2-D) spectral embedding model.

Capability of the reference Res2Net + SEBottle2neck
(/root/reference/model.py:256-509, ctor se_res2net50_v1b at :381-386): 3-conv
stem to 16 channels, four stages [3,4,6,3] of scale-4 baseWidth-26 SE
bottlenecks (expansion 2) with avg-pool downsampling, global average pool,
linear classifier with log-softmax. Returns (embedding, log_probs).

Note: the reference's `-m res2net` CLI path crashes on a missing
`import math` (/root/reference/model.py:412); this implementation is the
working equivalent.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from asvspoof2021_air_tpu.models.common import (
    SELayer2D,
    batch_norm,
    bn_relu,
    conv_kaiming_init,
    to_2d_input,
)


class SEBottle2neck(nn.Module):
    """(/root/reference/model.py:389-489)"""

    planes: int
    stride: int = 1
    base_width: int = 26
    scale: int = 4
    stype: str = "normal"  # 'stage' for the first block of a stage
    fused_bn: bool = False  # bn+relu via the recompute-VJP (train mode)
    expansion = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        nums = 1 if self.scale == 1 else self.scale - 1
        in_planes = x.shape[-1]
        out_planes = self.planes * self.expansion

        out = nn.Conv(width * self.scale, (1, 1), use_bias=False,
                      kernel_init=conv_kaiming_init)(x)
        out = bn_relu(out, train, fused=self.fused_bn)

        groups = jnp.split(out, self.scale, axis=-1)
        outs = []
        sp = None
        for i in range(nums):
            sp = groups[i] if (i == 0 or self.stype == "stage") else sp + groups[i]
            sp = nn.Conv(
                width, (3, 3), strides=(self.stride, self.stride),
                padding=((1, 1), (1, 1)), use_bias=False,
                kernel_init=conv_kaiming_init,
            )(sp)
            sp = bn_relu(sp, train, fused=self.fused_bn)
            outs.append(sp)
        if self.scale != 1 and self.stype == "normal":
            outs.append(groups[-1])
        elif self.scale != 1 and self.stype == "stage":
            outs.append(
                nn.avg_pool(groups[-1], (3, 3), strides=(self.stride, self.stride),
                            padding=((1, 1), (1, 1)))
            )
        out = jnp.concatenate(outs, axis=-1)

        out = nn.Conv(out_planes, (1, 1), use_bias=False,
                      kernel_init=conv_kaiming_init)(out)
        out = batch_norm(train)(out)
        out = SELayer2D(out_planes, reduction=16)(out)

        if self.stride != 1 or in_planes != out_planes:
            # torch AvgPool2d(stride, ceil_mode, count_include_pad=False) then
            # 1x1 conv + BN (/root/reference/model.py:294-307). For the
            # stride values used (1 or 2) on even extents, plain VALID
            # avg-pool is equivalent; ceil-mode edges are handled by padding.
            residual = x
            if self.stride != 1:
                h, w = residual.shape[1], residual.shape[2]
                ph = (-h) % self.stride
                pw = (-w) % self.stride
                if ph or pw:
                    # ceil_mode with count_include_pad=False == mean over the
                    # valid window only; replicate-free masked pooling via sum
                    # and true counts.
                    ones = jnp.ones_like(residual[..., :1])
                    s = nn.avg_pool(
                        jnp.pad(residual, ((0, 0), (0, ph), (0, pw), (0, 0))),
                        (self.stride, self.stride),
                        strides=(self.stride, self.stride),
                    )
                    cnt = nn.avg_pool(
                        jnp.pad(ones, ((0, 0), (0, ph), (0, pw), (0, 0))),
                        (self.stride, self.stride),
                        strides=(self.stride, self.stride),
                    )
                    residual = s / jnp.maximum(cnt, 1e-12)
                else:
                    residual = nn.avg_pool(
                        residual, (self.stride, self.stride),
                        strides=(self.stride, self.stride),
                    )
            residual = nn.Conv(out_planes, (1, 1), use_bias=False,
                               kernel_init=conv_kaiming_init)(residual)
            residual = batch_norm(train)(residual)
        else:
            residual = x

        return nn.relu(out + residual)


class SERes2Net50(nn.Module):
    """(/root/reference/model.py:256-386)"""

    num_classes: int = 2
    base_width: int = 26
    scale: int = 4
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    fused_bn: bool = False  # bn+relu via the recompute-VJP (train mode)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = to_2d_input(x)  # (B, F, T, 1)

        for i in range(3):
            x = nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        kernel_init=conv_kaiming_init)(x)
            if i < 2:
                x = bn_relu(x, train, fused=self.fused_bn)
        x = bn_relu(x, train, fused=self.fused_bn)

        for planes, n_blocks, stride in zip(
            (16, 32, 64, 128), self.layers, (1, 2, 2, 2)
        ):
            x = SEBottle2neck(planes, stride, self.base_width, self.scale,
                              stype="stage",
                              fused_bn=self.fused_bn)(x, train)
            for _ in range(1, n_blocks):
                x = SEBottle2neck(planes, 1, self.base_width, self.scale,
                                  fused_bn=self.fused_bn)(x, train)

        feat = jnp.mean(x, axis=(1, 2))  # (B, 256)
        out = nn.Dense(self.num_classes)(feat)
        return feat, nn.log_softmax(out, axis=-1)
