"""Model registry: CLI-name -> constructor, mirroring the reference's
model selection switch (/root/reference/main_train.py:161-170)."""

from __future__ import annotations

from typing import Any, Callable, Dict

from flax import linen as nn

from asvspoof2021_air_tpu.models.convnet import ConvNet
from asvspoof2021_air_tpu.models.ecapa import ECAPA_TDNN
from asvspoof2021_air_tpu.models.lcnn import LCNN
from asvspoof2021_air_tpu.models.rawnet import RawNet
from asvspoof2021_air_tpu.models.res2net import SERes2Net50
from asvspoof2021_air_tpu.models.resnet import ResNet


def _build_resnet(enc_dim: int = 256, nclasses: int = 2, feat_dim: int = 60,
                  dtype=None, fused_bn: bool = False, **kw):
    # num_nodes=3: residual frequency extent for 60-dim LFCC
    # (/root/reference/main_train.py:162-163).
    node_dict = {60: 3}
    return ResNet(num_nodes=node_dict.get(feat_dim, max(feat_dim // 20, 1)),
                  enc_dim=enc_dim, resnet_type="18", nclasses=nclasses,
                  dtype=dtype, fused_bn=fused_bn)


def _build_lcnn(enc_dim: int = 256, nclasses: int = 2, feat_dim: int = 60,
                feat_len: int = 750, dtype=None, fused_bn: bool = False, **kw):
    return LCNN(num_nodes=feat_dim, enc_dim=enc_dim, nclasses=nclasses,
                feat_len=feat_len, dtype=dtype, fused_bn=fused_bn)


def _build_ecapa(enc_dim: int = 256, nclasses: int = 2, feat_dim: int = 60,
                 dtype=None, fused_pool: bool = False,
                 pool_interpret: bool = False, fused_bn: bool = False, **kw):
    return ECAPA_TDNN(C=512, model_scale=8, n_out=nclasses, n_feat=feat_dim,
                      enc_dim=enc_dim, dtype=dtype, fused_pool=fused_pool,
                      pool_interpret=pool_interpret, fused_bn=fused_bn)


def _build_res2net(nclasses: int = 2, fused_bn: bool = False, **kw):
    return SERes2Net50(num_classes=nclasses, fused_bn=fused_bn)


def _build_cnn(enc_dim: int = 256, nclasses: int = 2,
               fused_bn: bool = False, **kw):
    return ConvNet(num_classes=nclasses, enc_dim=enc_dim, fused_bn=fused_bn)


def _build_rawnet(rawnet_args=None, **kw):
    return RawNet(d_args=rawnet_args)


MODEL_REGISTRY: Dict[str, Callable[..., nn.Module]] = {
    "cnn": _build_cnn,
    "resnet": _build_resnet,
    "lcnn": _build_lcnn,
    "res2net": _build_res2net,
    "ecapa": _build_ecapa,
    "rawnet": _build_rawnet,
}


def build_model(name: str, **kwargs: Any) -> nn.Module:
    """Build a model by CLI name (cnn|resnet|lcnn|res2net|ecapa|rawnet)."""
    if name not in MODEL_REGISTRY:
        raise ValueError(
            f"unknown model '{name}'; choices: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name](**kwargs)
