"""Subband ensemble: split the frequency axis into bands, run an LCNN per
band, concatenate the band embeddings
(capability of /root/reference/model.py:612-639)."""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
from flax import linen as nn

from asvspoof2021_air_tpu.models.lcnn import LCNN


class Subband(nn.Module):
    num_nodes: int = 60
    enc_dim: int = 256
    num_classes: int = 2
    subband_num: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        # x: (B, T, F); split along frequency.
        band = x.shape[-1] // self.subband_num
        feats = []
        for i in range(self.subband_num):
            enc = self.enc_dim // self.subband_num
            if i == 0:
                enc += self.enc_dim % self.subband_num
            sub = x[..., i * band:(i + 1) * band]
            feat_i, _ = LCNN(num_nodes=band, enc_dim=enc,
                             nclasses=self.num_classes)(sub, train)
            feats.append(feat_i)
        return feats
