"""Evaluation metrics: DET curve, EER, tandem detection cost (t-DCF).

Numpy-only (no JAX dependency) so score evaluation runs anywhere.
"""

from asvspoof2021_air_tpu.metrics.eer import (
    compute_det_curve,
    compute_eer,
    polarity_min_eer,
)
from asvspoof2021_air_tpu.metrics.tdcf import (
    ASVSPOOF2019_COST_MODEL,
    compute_tDCF,
    obtain_asv_error_rates,
)
from asvspoof2021_air_tpu.metrics.evaluate import (
    compute_eer_and_tdcf,
    eer_from_score_file,
    read_score_file,
)

__all__ = [
    "compute_det_curve",
    "compute_eer",
    "polarity_min_eer",
    "compute_tDCF",
    "obtain_asv_error_rates",
    "ASVSPOOF2019_COST_MODEL",
    "compute_eer_and_tdcf",
    "eer_from_score_file",
    "read_score_file",
]
