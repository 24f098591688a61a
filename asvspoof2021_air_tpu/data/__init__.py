"""Data subsystem: protocols, audio IO, feature datasets, batch pipeline."""

from asvspoof2021_air_tpu.data import protocol  # noqa: F401
from asvspoof2021_air_tpu.data.pipeline import (  # noqa: F401
    RatioMixIterator,
    SequentialIterator,
    WaveformIterator,
    collate,
    pad_or_crop,
)
from asvspoof2021_air_tpu.data.prefetch import PrefetchIterator  # noqa: F401
from asvspoof2021_air_tpu.data.datasets import (  # noqa: F401
    ASVspoof2019FeatureDataset,
    AugmentedFeatureDataset,
    EvalFeatureDataset,
    RawAudioDataset,
)
