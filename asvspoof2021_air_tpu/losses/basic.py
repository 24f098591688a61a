"""Base classification losses: cross-entropy, BCE, focal, center loss."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy on integer labels (torch nn.CrossEntropyLoss
    semantics, the reference base loss at /root/reference/main_train.py:251)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels.astype(jnp.int32)[:, None], axis=-1)
    return jnp.mean(nll)


def binary_cross_entropy_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean BCE-with-logits on {0,1} float labels (the reference 'bce' base
    loss option, /root/reference/main_train.py:65)."""
    labels = labels.astype(logits.dtype)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray, gamma: float = 0.0,
               alpha=None, size_average: bool = True) -> jnp.ndarray:
    """Focal loss (capability of /root/reference/loss.py:341-374)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    logpt = jnp.take_along_axis(logp, labels.astype(jnp.int32)[:, None], axis=-1)[:, 0]
    pt = jnp.exp(jax.lax.stop_gradient(logpt))
    if alpha is not None:
        alpha = jnp.asarray(alpha, dtype=logits.dtype)
        if alpha.ndim == 0:
            alpha = jnp.stack([alpha, 1 - alpha])
        at = alpha[labels.astype(jnp.int32)]
        logpt = logpt * at
    loss = -((1 - pt) ** gamma) * logpt
    return jnp.mean(loss) if size_average else jnp.sum(loss)


class CenterLoss(nn.Module):
    """Class-center pull loss: 0.5 * sum ||x_i - c_{y_i}||^2
    (capability of /root/reference/loss.py:10-59). The reference hand-writes
    a backward that normalizes the center gradient by per-class counts; here
    the count normalization is folded into the loss as a per-sample weight on
    the center term, which autodiff turns into the same count-normalized
    center pull while features keep the plain gradient."""

    num_classes: int
    feat_dim: int

    @nn.compact
    def __call__(self, feat: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        centers = self.param(
            "centers", nn.initializers.normal(1.0), (self.num_classes, self.feat_dim)
        )
        labels = labels.astype(jnp.int32)
        onehot = jax.nn.one_hot(labels, self.num_classes, dtype=feat.dtype)
        counts = jnp.sum(onehot, axis=0) + 1.0  # reference inits counts at 1
        diff = feat - centers[labels]
        sg = jax.lax.stop_gradient
        # Value: 0.5 * sum ||diff||^2 (constant term, no gradient).
        loss = 0.5 * jnp.sum(sg(diff) ** 2)
        # Feature gradient = diff, via a value-zero linear term.
        feat_term = jnp.sum((feat - sg(feat)) * sg(diff))
        # Center gradient = (c_j - x_i)/count_j per sample (reference Eq. 4,
        # /root/reference/loss.py:50-57), also value-zero.
        pull = jnp.sum(
            (centers[labels] - sg(centers[labels]))
            * sg(-diff / counts[labels][:, None])
        )
        return loss + feat_term + pull
