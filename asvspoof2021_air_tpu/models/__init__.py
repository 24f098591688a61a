"""Embedding model families: ResNet18, LCNN, ECAPA-TDNN, SE-Res2Net50,
RawNet2, ConvNet, Subband, and the adversarial channel classifier.

All models share a single convention: input features (B, T, F) — time-major,
channels-last (the natural XLA layout) — and output ``(embedding, logits)``
2-tuples, mirroring the reference model contract
(/root/reference/model.py:253, ecapa_tdnn.py:198).
"""

from asvspoof2021_air_tpu.models.common import MaxFeatureMap, SelfAttentionPooling
from asvspoof2021_air_tpu.models.resnet import ResNet, RESNET_CONFIGS
from asvspoof2021_air_tpu.models.lcnn import LCNN
from asvspoof2021_air_tpu.models.ecapa import ECAPA_TDNN
from asvspoof2021_air_tpu.models.res2net import SERes2Net50
from asvspoof2021_air_tpu.models.rawnet import RawNet, RAWNET2_DEFAULT_ARGS
from asvspoof2021_air_tpu.models.convnet import ConvNet
from asvspoof2021_air_tpu.models.subband import Subband
from asvspoof2021_air_tpu.models.classifier import ChannelClassifier, gradient_reversal
from asvspoof2021_air_tpu.models.registry import build_model, MODEL_REGISTRY

__all__ = [
    "MaxFeatureMap",
    "SelfAttentionPooling",
    "ResNet",
    "RESNET_CONFIGS",
    "LCNN",
    "ECAPA_TDNN",
    "SERes2Net50",
    "RawNet",
    "RAWNET2_DEFAULT_ARGS",
    "ConvNet",
    "Subband",
    "ChannelClassifier",
    "gradient_reversal",
    "build_model",
    "MODEL_REGISTRY",
]
