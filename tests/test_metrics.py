"""Metrics parity tests.

The authoritative check: EERs computed from the reference's shipped score
files must match the published baseline numbers (BASELINE.md), which were
produced with the reference's own estimator.
"""

import os

import numpy as np
import pytest

from asvspoof2021_air_tpu.fusion import avg_fuse, entropy_weights, fused_eer, weighted_fuse
from asvspoof2021_air_tpu.metrics import (
    compute_det_curve,
    compute_eer,
    compute_tDCF,
    eer_from_score_file,
    polarity_min_eer,
)

SCORES = "/root/reference/scores"

GOLDEN_DEV_EERS = {
    "lfcc_ecapa512ctst_ocs_19dev_score.txt": 0.00197,
    "lfcc_ecapa512cfst_ocs_19dev_score.txt": 0.00228,
    "lfcc_ecapa512ctsf_ocs_19dev_score.txt": 0.00237,
}

needs_scores = pytest.mark.skipif(
    not os.path.isdir(SCORES), reason="reference score files not mounted"
)


def test_eer_separable():
    tar = np.array([1.0, 2.0, 3.0, 4.0])
    non = np.array([-4.0, -3.0, -2.0, -1.0])
    eer, thr = compute_eer(tar, non)
    assert eer == 0.0
    assert -1.0 <= thr <= 1.0


def test_eer_symmetric_overlap():
    rng = np.random.default_rng(0)
    tar = rng.normal(1.0, 1.0, 20000)
    non = rng.normal(-1.0, 1.0, 20000)
    eer, _ = compute_eer(tar, non)
    # Analytic EER for unit-variance gaussians 2 apart: Phi(-1) ~ 15.87 %.
    assert abs(eer - 0.1587) < 0.01


def test_det_curve_monotone():
    rng = np.random.default_rng(1)
    frr, far, thr = compute_det_curve(rng.normal(1, 1, 500), rng.normal(0, 1, 400))
    assert np.all(np.diff(frr) >= 0)
    assert np.all(np.diff(far) <= 0)
    assert frr[0] == 0.0 and far[0] == 1.0
    assert len(frr) == len(far) == len(thr) == 901


def test_polarity_min():
    tar = np.array([1.0, 2.0, 3.0])
    non = np.array([4.0, 5.0, 6.0])
    # Scores inverted: raw EER is 100 %, polarity-min resolves it.
    assert polarity_min_eer(tar, non) == 0.0


@needs_scores
@pytest.mark.parametrize("fname,expected", sorted(GOLDEN_DEV_EERS.items()))
def test_golden_dev_eers(fname, expected):
    eer = eer_from_score_file(os.path.join(SCORES, fname))
    assert abs(eer - expected) < 5e-5, f"{fname}: got {eer:.5f}, want {expected:.5f}"


@needs_scores
def test_golden_fusion_eer():
    paths = [os.path.join(SCORES, f) for f in sorted(GOLDEN_DEV_EERS)]
    fused = avg_fuse(paths)
    eer = fused_eer(fused)
    # BASELINE.md: 3-system avg fusion on 19LA dev = 0.157 %.
    assert abs(eer - 0.00157) < 5e-5


@needs_scores
def test_weighted_fusion_reasonable():
    paths = [os.path.join(SCORES, f) for f in sorted(GOLDEN_DEV_EERS)]
    fused = weighted_fuse(paths)
    eer = fused_eer(fused)
    assert eer < 0.003


def test_entropy_weights_sum_to_one():
    w = entropy_weights([0.00197, 0.00228, 0.00237])
    assert abs(sum(w) - 1.0) < 1e-12
    assert all(wi > 0 for wi in w)
    assert entropy_weights([0.5, 0.5]) == [0.5, 0.5]


def test_tdcf_synthetic():
    rng = np.random.default_rng(2)
    bona = rng.normal(2.0, 1.0, 2000)
    spoof = rng.normal(-2.0, 1.0, 8000)
    tdcf, thr = compute_tDCF(bona, spoof, 0.01, 0.01, 0.95)
    assert tdcf.shape == thr.shape
    assert 0.0 <= float(np.min(tdcf)) < 0.2


def test_compute_eer_and_tdcf_with_synthetic_asv(tmp_path):
    """Full EER+min-tDCF path with a synthetic organizers' ASV score file
    (the reference requires their real file; the algorithm is exercised
    end-to-end here)."""
    from asvspoof2021_air_tpu.metrics import compute_eer_and_tdcf

    g = np.random.default_rng(9)
    asv_lines = []
    for i in range(300):
        key = ("target", "nontarget", "spoof")[i % 3]
        mean = {"target": 3.0, "nontarget": -2.0, "spoof": -1.0}[key]
        asv_lines.append(f"SPK{i % 3} {key} {mean + g.standard_normal():.4f}")
    asv_file = tmp_path / "asv.txt"
    asv_file.write_text("\n".join(asv_lines))

    cm_lines = []
    for i in range(400):
        key = "bonafide" if i % 2 == 0 else "spoof"
        mean = 2.0 if key == "bonafide" else -2.0
        cm_lines.append(f"LA_E_{i:06d} A01 {key} {mean + g.standard_normal():.4f}")
    cm_file = tmp_path / "cm.txt"
    cm_file.write_text("\n".join(cm_lines))

    eer, min_tdcf = compute_eer_and_tdcf(str(cm_file),
                                         asv_score_file=str(asv_file))
    assert 0.0 <= eer < 0.2
    assert min_tdcf is not None and 0.0 <= min_tdcf < 0.6
