"""Loss registry mirroring the reference --add_loss switch
(/root/reference/main_train.py:66-67, 255-277; 'iso_sq' included — the
reference handles it in the loop but forgot it in argparse choices)."""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

from flax import linen as nn

from asvspoof2021_air_tpu.losses.one_class import (
    AMSoftmax,
    AngularIsoLoss,
    IsolateLoss,
    IsolateSquareLoss,
    OCSoftmax,
    P2SGradLoss,
)


def build_loss(
    name: Optional[str],
    enc_dim: int = 256,
    r_real: float = 0.9,
    r_fake: float = 0.2,
    alpha: float = 20.0,
    nclasses: int = 2,
) -> Optional[nn.Module]:
    """Build an add-loss module by CLI name; None for plain CE training."""
    if name is None or name == "None":
        return None
    if name in ("ang_iso", "ocsoftmax"):
        return AngularIsoLoss(feat_dim=enc_dim, r_real=r_real, r_fake=r_fake,
                              alpha=alpha)
    if name == "isolate":
        return IsolateLoss(feat_dim=enc_dim, r_real=r_real, r_fake=r_fake)
    if name == "iso_sq":
        return IsolateSquareLoss(feat_dim=enc_dim, r_real=r_real, r_fake=r_fake)
    if name == "p2sgrad":
        return P2SGradLoss(in_dim=enc_dim, out_dim=nclasses, smooth=0.0)
    if name == "amsoftmax":
        return AMSoftmax(num_classes=nclasses, enc_dim=enc_dim)
    raise ValueError(f"unknown add_loss '{name}'")


LOSS_REGISTRY: Dict[str, Callable[..., Any]] = {
    name: (lambda name=name, **kw: build_loss(name, **kw))
    for name in ("ang_iso", "ocsoftmax", "isolate", "iso_sq", "p2sgrad", "amsoftmax")
}
