"""asvspoof2021_air_tpu — TPU-native anti-spoofing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
yzyouzhang/ASVspoof2021_AIR research stack (channel-robust synthetic-speech
detection): on-device LFCC front-end, CNN embedding models (ResNet18 / LCNN /
ECAPA-TDNN / SE-Res2Net50 / RawNet2), one-class losses (OC-Softmax et al.),
EER / min-tDCF metrics, score fusion, and on-the-fly channel augmentation —
designed TPU-first (SPMD data parallelism over a device mesh, fused Pallas
front-end kernel, static shapes, bf16 matmuls).

Reference behavior documented throughout via file:line citations into the
upstream PyTorch codebase (mounted read-only at /root/reference).
"""

__version__ = "0.1.0"

from asvspoof2021_air_tpu import metrics  # noqa: F401  (lightweight, numpy-only)
