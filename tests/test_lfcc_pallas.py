"""Fused Pallas LFCC kernel vs the jnp reference implementation
(interpret mode on CPU; the real-TPU path is exercised by bench.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from asvspoof2021_air_tpu.ops.lfcc import LFCC, LFCCConfig
from asvspoof2021_air_tpu.ops.lfcc_pallas import PallasLFCC


def test_matches_jnp_reference():
    g = np.random.default_rng(0)
    wav = jnp.asarray(0.5 * g.standard_normal((2, 48000)), jnp.float32)
    ref = np.asarray(LFCC()(wav))
    fused = np.asarray(PallasLFCC(interpret=True)(wav))
    assert fused.shape == ref.shape == (2, 301, 60)
    np.testing.assert_allclose(fused, ref, atol=5e-4)


def test_matches_with_lengths():
    g = np.random.default_rng(1)
    wav = jnp.asarray(0.5 * g.standard_normal((2, 48000)), jnp.float32)
    lens = jnp.asarray([32000, 48000])
    ref = np.asarray(LFCC()(wav, lens))
    fused = np.asarray(PallasLFCC(interpret=True)(wav, lens))
    np.testing.assert_allclose(fused, ref, atol=5e-4)


def test_short_utterance_single_tile():
    g = np.random.default_rng(2)
    wav = jnp.asarray(0.5 * g.standard_normal((3, 8000)), jnp.float32)  # 51 frames
    ref = np.asarray(LFCC()(wav))
    fused = np.asarray(PallasLFCC(interpret=True)(wav))
    assert fused.shape == ref.shape == (3, 51, 60)
    np.testing.assert_allclose(fused, ref, atol=5e-4)


def test_rejects_unsupported_configs():
    with pytest.raises(ValueError):
        PallasLFCC(LFCCConfig(win_length=400, hop_length=160))
    with pytest.raises(ValueError):
        PallasLFCC(LFCCConfig(with_energy=True))


def test_split_bf16_mode_matches_reference():
    """dft_dot="split_bf16" (bf16 hi+lo decomposition of waveform and DFT
    matrix, 3 dots per f32 dot) recovers ~f32 accuracy — a measured-neutral
    speed experiment kept selectable (docs/PERFORMANCE.md "Front-end dtype
    experiment")."""
    g = np.random.default_rng(3)
    wav = jnp.asarray(0.5 * g.standard_normal((2, 48000)), jnp.float32)
    ref = np.asarray(LFCC()(wav))
    split = np.asarray(
        PallasLFCC(interpret=True, dft_dot="split_bf16")(wav))
    np.testing.assert_allclose(split, ref, atol=1e-3)
    with pytest.raises(ValueError):
        PallasLFCC(dft_dot="int8")
