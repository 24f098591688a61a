"""One-class and margin losses over embedding space.

Every loss with trainable parameters is a flax module whose params live in
their own tree and are stepped by a separate optimizer, mirroring the
reference's backbone-Adam + loss-SGD split
(/root/reference/main_train.py:175-176, 260-277).

Score conventions follow the reference exactly (they flow into score files):
OC-Softmax / AngularIso return NEGATED cosine similarity to the bona fide
center (/root/reference/loss.py:97), P2SGrad returns -cos_theta[:, 0]
(loss.py:335).
"""

from asvspoof2021_air_tpu.losses.one_class import (
    AMSoftmax,
    AngularIsoLoss,
    IsolateLoss,
    IsolateSquareLoss,
    OCSoftmax,
    P2SGradLoss,
)
from asvspoof2021_air_tpu.losses.basic import (
    CenterLoss,
    binary_cross_entropy_with_logits,
    cross_entropy,
    focal_loss,
)
from asvspoof2021_air_tpu.losses.registry import LOSS_REGISTRY, build_loss

__all__ = [
    "OCSoftmax",
    "AngularIsoLoss",
    "IsolateLoss",
    "IsolateSquareLoss",
    "P2SGradLoss",
    "AMSoftmax",
    "CenterLoss",
    "cross_entropy",
    "binary_cross_entropy_with_logits",
    "focal_loss",
    "LOSS_REGISTRY",
    "build_loss",
]
