"""CQCC front-end tests: shapes, tone localization in constant-Q space,
resampling matrix sanity, variable-length behavior."""

import numpy as np

import jax.numpy as jnp

from asvspoof2021_air_tpu.ops.cqcc import (
    CQCC,
    CQCCConfig,
    cq_filterbank,
    uniform_resample_matrix,
)


def tone(freq, n=32000, sr=16000, amp=0.3):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_output_shape():
    cfg = CQCCConfig()
    ex = CQCC(cfg)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((3, 32000)),
                      jnp.float32)
    out = np.asarray(ex(wav))
    assert out.shape == (3, 201, 90)
    assert np.isfinite(out).all()


def test_cq_filterbank_tone_localization():
    """A pure tone's CQ energy must peak at the geometrically correct bin."""
    cfg = CQCCConfig()
    fb = cq_filterbank(cfg)
    for freq in (250.0, 440.0, 1000.0, 3000.0):
        wav = tone(freq, n=cfg.win_length)
        spec = np.abs(np.fft.rfft(wav * np.hanning(cfg.win_length))) ** 2
        cq = spec @ fb
        expected_bin = int(round(np.log2(freq / cfg.fmin) * cfg.bins_per_octave))
        peak = int(np.argmax(cq))
        assert abs(peak - expected_bin) <= 8, (freq, peak, expected_bin)


def test_constant_q_spacing():
    """Octave-shifted tones land a constant number of bins apart."""
    cfg = CQCCConfig()
    fb = cq_filterbank(cfg)

    def peak(freq):
        wav = tone(freq, n=cfg.win_length)
        spec = np.abs(np.fft.rfft(wav * np.hanning(cfg.win_length))) ** 2
        return int(np.argmax(spec @ fb))

    d1 = peak(1000.0) - peak(500.0)
    d2 = peak(4000.0) - peak(2000.0)
    assert abs(d1 - cfg.bins_per_octave) <= 8
    assert abs(d2 - cfg.bins_per_octave) <= 8


def test_resample_matrix_partition():
    """Each uniform-grid column is a convex combination of 1-2 CQ bins."""
    M = uniform_resample_matrix(CQCCConfig())
    col_sums = M.sum(axis=0)
    np.testing.assert_allclose(col_sums, 1.0, atol=1e-5)
    assert np.all((M >= 0) & (M <= 1))


def test_variable_length_matches_per_utterance():
    ex = CQCC(CQCCConfig())
    g = np.random.default_rng(1)
    lens = [16000, 24000]
    L = max(lens)
    batch = np.zeros((2, L), np.float32)
    for i, l in enumerate(lens):
        batch[i, :l] = 0.3 * g.standard_normal(l)
    out = np.asarray(ex(jnp.asarray(batch), jnp.asarray(lens)))
    single = np.asarray(ex(jnp.asarray(batch[0:1, :lens[0]])))
    T0 = 1 + lens[0] // 160
    # static coefficients of interior frames match; boundary frames touch
    # the zero padding (window 2048 >> hop), so compare away from the edge
    margin = 8
    np.testing.assert_allclose(out[0, margin:T0 - margin, :30],
                               single[0, margin:, :30][:T0 - 2 * margin],
                               atol=1e-3)
