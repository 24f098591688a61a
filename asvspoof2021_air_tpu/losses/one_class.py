"""One-class losses: OC-Softmax (= AngularIsoLoss), Isolate, P2SGrad, AMSoftmax.

Masked formulations: the reference indexes by label
(scores[labels==0] etc., /root/reference/loss.py:85-86); here every branch is
a jnp.where/mask so the computation stays static-shaped under jit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _l2_normalize(x, axis=-1, eps=1e-12):
    # torch F.normalize semantics: x / max(||x||, eps)
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


class OCSoftmax(nn.Module):
    """One-class softmax over cosine similarity to a learned center.

    loss = mean softplus(alpha * m(labels, cos)), with margins
    m = r_real - cos for bona fide (label 0) and cos - r_fake for spoof
    (label 1). Returns (loss, -cos) — the NEGATED cosine score, exactly as
    the reference (/root/reference/loss.py:176-206; duplicated as
    AngularIsoLoss at :62-97). Training defaults r_real=0.9, r_fake=0.2,
    alpha=20 (/root/reference/main_train.py:69-71).
    """

    feat_dim: int = 2
    r_real: float = 0.9
    r_fake: float = 0.5
    alpha: float = 20.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        center = self.param(
            "center",
            nn.initializers.variance_scaling(2.0 / (1 + 0.25 ** 2), "fan_in", "uniform"),
            (1, self.feat_dim),
        )
        w = _l2_normalize(center, axis=1)
        xn = _l2_normalize(x, axis=1)
        scores = (xn @ w.T)[:, 0]  # (B,)

        margins = jnp.where(
            labels == 0, self.r_real - scores, scores - self.r_fake
        )
        loss = jnp.mean(jax.nn.softplus(self.alpha * margins))
        return loss, -scores


class AngularIsoLoss(OCSoftmax):
    """Alias: the reference defines AngularIsoLoss and OCSoftmax identically
    (/root/reference/loss.py:62-97 vs :176-206)."""


class IsolateLoss(nn.Module):
    """Euclidean-ball one-class loss: hinge on ||x - center|| against
    r_real/r_fake radii (/root/reference/loss.py:99-139). Returns the scalar
    loss; the scoring rule is the distance to the center
    (/root/reference/main_train.py:541).
    """

    feat_dim: int = 2
    r_real: float = 0.042
    r_fake: float = 1.638

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        center = self.param(
            "center", nn.initializers.normal(1.0), (1, self.feat_dim)
        )
        dist = jnp.linalg.norm(x - center, axis=1)
        real_mask = (labels == 0).astype(x.dtype)
        fake_mask = (labels == 1).astype(x.dtype)
        real_term = jnp.sum(nn.relu(dist - self.r_real) * real_mask) / jnp.maximum(
            jnp.sum(real_mask), 1.0
        )
        fake_term = jnp.sum(nn.relu(self.r_fake - dist) * fake_mask) / jnp.maximum(
            jnp.sum(fake_mask), 1.0
        )
        return real_term + fake_term

    def score(self, variables, x: jnp.ndarray) -> jnp.ndarray:
        """Distance-to-center score (/root/reference/main_train.py:541)."""
        center = variables["params"]["center"]
        return jnp.linalg.norm(x - center, axis=1)


class IsolateSquareLoss(nn.Module):
    """Squared-distance variant (/root/reference/loss.py:141-173)."""

    feat_dim: int = 2
    r_real: float = 0.042
    r_fake: float = 1.638

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        center = self.param(
            "center", nn.initializers.normal(1.0), (1, self.feat_dim)
        )
        sq = jnp.sum((x - center) ** 2, axis=1)
        real_mask = (labels == 0).astype(x.dtype)
        fake_mask = (labels == 1).astype(x.dtype)
        real_term = jnp.sum(nn.relu(sq - self.r_real ** 2) * real_mask) / jnp.maximum(
            jnp.sum(real_mask), 1.0
        )
        fake_term = jnp.sum(nn.relu(self.r_fake ** 2 - sq) * fake_mask) / jnp.maximum(
            jnp.sum(fake_mask), 1.0
        )
        return real_term + fake_term

    def score(self, variables, x: jnp.ndarray) -> jnp.ndarray:
        center = variables["params"]["center"]
        return jnp.linalg.norm(x - center, axis=1)


class P2SGradLoss(nn.Module):
    """P2SGrad MSE on cos-theta against (optionally smoothed) one-hot targets
    (/root/reference/loss.py:244-335). Returns (loss, -cos_theta[:, 0]).
    Weight columns are renormalized to unit norm each call, mirroring the
    reference's renorm trick (loss.py:303)."""

    in_dim: int
    out_dim: int = 2
    smooth: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        weight = self.param(
            "weight", nn.initializers.uniform(2.0), (self.in_dim, self.out_dim)
        )
        # renorm(2, dim=1, maxnorm=1e-5).mul(1e5): column-wise L2 normalize.
        w = weight / jnp.maximum(jnp.linalg.norm(weight, axis=0, keepdims=True), 1e-12)
        x_mod = jnp.linalg.norm(x, axis=1, keepdims=True)
        cos_theta = jnp.clip((x @ w) / jnp.maximum(x_mod, 1e-12), -1.0, 1.0)

        onehot = jax.nn.one_hot(labels.astype(jnp.int32), self.out_dim, dtype=x.dtype)
        if self.smooth:
            onehot = onehot * (1 - self.smooth) + self.smooth / self.out_dim
        onehot = jax.lax.stop_gradient(onehot)
        loss = jnp.mean((cos_theta - onehot) ** 2)
        return loss, -cos_theta[:, 0]


class AMSoftmax(nn.Module):
    """Additive-margin softmax head (/root/reference/loss.py:209-234).
    Returns (cosine logits, margin-scaled logits); train with cross-entropy
    on the margin logits, score with softmax(logits)[:, 0]
    (/root/reference/generate_score.py:106-108)."""

    num_classes: int
    enc_dim: int
    s: float = 20.0
    m: float = 0.9

    @nn.compact
    def __call__(self, feat: jnp.ndarray, labels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        centers = self.param(
            "centers", nn.initializers.normal(1.0), (self.num_classes, self.enc_dim)
        )
        nfeat = _l2_normalize(feat, axis=-1)
        ncenters = _l2_normalize(centers, axis=-1)
        logits = nfeat @ ncenters.T
        onehot = jax.nn.one_hot(labels.astype(jnp.int32), self.num_classes,
                                dtype=feat.dtype)
        margin_logits = self.s * (logits - self.m * onehot)
        return logits, margin_logits
