"""Adversarial channel classifier behind a gradient-reversal layer.

Capability of /root/reference/model.py:976-1023: identity forward,
gradient multiplied by -lambda in the backward pass (Ganin & Lempitsky
domain-adversarial training), feeding an MLP channel classifier used by
the ADV_AUG training mode (/root/reference/main_train.py:211-224).

The GRL is a jax.custom_vjp — the TPU-native equivalent of the reference's
autograd.Function.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from asvspoof2021_air_tpu.models.common import linear_kaiming_init


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_reversal(x: jnp.ndarray, lambda_: float = 1.0) -> jnp.ndarray:
    """Identity in the forward pass; scales the cotangent by -lambda_ in the
    backward pass (/root/reference/model.py:984-994)."""
    return x


def _grl_fwd(x, lambda_):
    return x, None


def _grl_bwd(lambda_, _res, g):
    return (-lambda_ * g,)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)


class ChannelClassifier(nn.Module):
    """MLP channel classifier behind a GRL
    (/root/reference/model.py:1006-1023)."""

    enc_dim: int
    nclasses: int
    lambda_: float = 0.05
    dropout_rate: float = 0.3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = gradient_reversal(x, self.lambda_)
        x = nn.Dense(self.enc_dim // 2, kernel_init=linear_kaiming_init)(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.relu(x)
        x = nn.Dense(self.nclasses, kernel_init=linear_kaiming_init)(x)
        return nn.relu(x)
