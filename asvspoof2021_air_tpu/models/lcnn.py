"""Light CNN (LCNN) with Max-Feature-Map activations.

Capability of the reference LCNN (/root/reference/model.py:555-610): nine
conv blocks alternating 5x5/3x3 and 1x1 kernels with MFM activations,
four 2x2 max-pools, affine-free BatchNorms, then a dropout + MFM dense head.
Returns (embedding, logits).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from asvspoof2021_air_tpu.models.common import (
    MaxFeatureMap,
    batch_norm,
    to_2d_input,
)


def _mfm_conv(x, features, kernel, train, pool=False, norm=False, dtype=None,
              fused_bn=False):
    x = nn.Conv(features, kernel, padding="SAME", dtype=dtype)(x)
    x = MaxFeatureMap()(x)
    if pool:
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
    if norm:
        x = batch_norm(train, dtype, use_bias=False, use_scale=False,
                       recompute=fused_bn)(x)
    return x


class LCNN(nn.Module):
    """num_nodes = frequency dim of the input (60 for LFCC); the dense head
    is sized for feat_len=750 like the reference
    (/root/reference/model.py:590)."""

    num_nodes: int = 60
    enc_dim: int = 256
    nclasses: int = 2
    feat_len: int = 750
    dropout_rate: float = 0.7
    dtype: Optional[Any] = None   # compute dtype; params stay f32
    fused_bn: bool = False        # BN via the recompute-VJP (train mode)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = to_2d_input(x)  # (B, F, T, 1)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        dt = self.dtype
        x = _mfm_conv(x, 64, (5, 5), train, pool=True, dtype=dt,
                      fused_bn=self.fused_bn)            # conv1
        x = _mfm_conv(x, 64, (1, 1), train, norm=True, dtype=dt,
                      fused_bn=self.fused_bn)            # conv2
        x = _mfm_conv(x, 96, (3, 3), train, pool=True, norm=True, dtype=dt,
                      fused_bn=self.fused_bn) # conv3
        x = _mfm_conv(x, 96, (1, 1), train, norm=True, dtype=dt,
                      fused_bn=self.fused_bn)            # conv4
        x = _mfm_conv(x, 128, (3, 3), train, pool=True, dtype=dt,
                      fused_bn=self.fused_bn)           # conv5
        x = _mfm_conv(x, 128, (1, 1), train, norm=True, dtype=dt,
                      fused_bn=self.fused_bn)           # conv6
        x = _mfm_conv(x, 64, (3, 3), train, norm=True, dtype=dt,
                      fused_bn=self.fused_bn)            # conv7
        x = _mfm_conv(x, 64, (1, 1), train, norm=True, dtype=dt,
                      fused_bn=self.fused_bn)            # conv8
        x = _mfm_conv(x, 64, (3, 3), train, pool=True, dtype=dt,
                      fused_bn=self.fused_bn)            # conv9

        feat = x.reshape((x.shape[0], -1)).astype(jnp.float32)
        feat = nn.Dropout(self.dropout_rate, deterministic=not train)(feat)
        feat = nn.Dense(160)(feat)
        feat = MaxFeatureMap()(feat)
        feat = nn.Dense(self.enc_dim)(feat)
        out_dim = self.nclasses if self.nclasses >= 2 else 1
        out = nn.Dense(out_dim)(feat)
        return feat, out
