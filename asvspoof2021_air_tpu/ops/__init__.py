"""TPU-native DSP and compute ops: LFCC front-end, STFT, DCT, augmentation."""

from asvspoof2021_air_tpu.ops import dsp  # noqa: F401
from asvspoof2021_air_tpu.ops.lfcc import LFCC, LFCCConfig  # noqa: F401
from asvspoof2021_air_tpu.ops.cqcc import CQCC, CQCCConfig  # noqa: F401
