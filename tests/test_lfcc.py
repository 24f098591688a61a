"""Numerical parity of the on-device LFCC front-end against an independent
torch/scipy implementation of the reference recipe.

The torch oracle here is built from torch.stft + scipy DCT with the exact
hyperparameters of the reference front-end (win 320, hop 160, n_fft 512,
periodic Hamming, constant-pad centering, 20 linear triangular filters,
ortho DCT-II, replicate-padded deltas). Tolerance ~1e-3 absolute on the
log-domain features is far below anything that moves EER.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from asvspoof2021_air_tpu.ops import dsp
from asvspoof2021_air_tpu.ops.lfcc import LFCC, LFCCConfig, Melspec, STFT

torch = pytest.importorskip("torch")
import scipy.fft  # noqa: E402


def torch_lfcc_oracle(wav: np.ndarray, with_energy=False, with_delta=True):
    """Reference LFCC recipe via torch.stft (independent implementation of
    /root/reference/feature_extraction.py:93-138 semantics)."""
    x = torch.from_numpy(wav.copy())
    # pre-emphasis (reference does this in place on x[:, 1:])
    x[:, 1:] = x[:, 1:] - 0.97 * x[:, :-1]
    spec = torch.stft(
        x, 512, 160, 320,
        window=torch.hamming_window(320),
        onesided=True, pad_mode="constant", return_complex=True, center=True,
    )
    power = spec.abs().pow(2).permute(0, 2, 1).numpy()  # (B, T, 257)

    fb = dsp.linear_filterbank(512, 16000, 20).astype(np.float64)
    fb_feat = np.log10(power @ fb + np.finfo(np.float32).eps)
    lfcc = scipy.fft.dct(fb_feat, type=2, norm="ortho", axis=-1)
    if with_energy:
        energy = np.log10((power / 512).sum(-1) + np.finfo(np.float32).eps)
        lfcc[:, :, 0] = energy

    if with_delta:
        def delta_np(a):
            padded = np.concatenate([a[:, :1], a, a[:, -1:]], axis=1)
            return padded[:, 2:] - padded[:, :-2]
        d1 = delta_np(lfcc)
        d2 = delta_np(d1)
        lfcc = np.concatenate([lfcc, d1, d2], axis=-1)
    return lfcc


@pytest.fixture(scope="module")
def wav(rng=None):
    g = np.random.default_rng(688)
    return (0.5 * g.standard_normal((3, 32000))).astype(np.float32)


def test_lfcc_matches_torch_oracle(wav):
    ours = np.asarray(LFCC()(jnp.asarray(wav)))
    oracle = torch_lfcc_oracle(wav)
    assert ours.shape == oracle.shape == (3, 201, 60)
    np.testing.assert_allclose(ours, oracle, atol=2e-3, rtol=1e-3)


def test_lfcc_with_energy(wav):
    cfg = LFCCConfig(with_energy=True)
    ours = np.asarray(LFCC(cfg)(jnp.asarray(wav)))
    oracle = torch_lfcc_oracle(wav, with_energy=True)
    np.testing.assert_allclose(ours, oracle, atol=2e-3, rtol=1e-3)


def test_lfcc_no_delta(wav):
    cfg = LFCCConfig(with_delta=False)
    ours = np.asarray(LFCC(cfg)(jnp.asarray(wav)))
    assert ours.shape == (3, 201, 20)
    oracle = torch_lfcc_oracle(wav, with_delta=False)
    np.testing.assert_allclose(ours, oracle, atol=2e-3, rtol=1e-3)


def test_lfcc_variable_length_batch_matches_per_utterance():
    """Batch-padded extraction with lengths == per-utterance extraction."""
    g = np.random.default_rng(7)
    lens = [24000, 17603, 32000]
    L = max(lens)
    batch = np.zeros((len(lens), L), dtype=np.float32)
    for i, l in enumerate(lens):
        batch[i, :l] = 0.3 * g.standard_normal(l)

    ex = LFCC()
    batched = np.asarray(ex(jnp.asarray(batch), lengths=jnp.asarray(lens)))
    for i, l in enumerate(lens):
        single = np.asarray(ex(jnp.asarray(batch[i:i + 1, :l])))
        T = 1 + l // 160
        np.testing.assert_allclose(
            batched[i, :T], single[0], atol=1e-4, rtol=1e-4,
            err_msg=f"utterance {i} (len {l})",
        )


def test_silence_frame_matches_reference_recipe():
    """Silence pad value = first LFCC frame of 3200 zero samples
    (cf. /root/reference/dataset.py:13-16)."""
    sf = LFCC().silence_frame()
    assert sf.shape == (60,)
    # Zero signal: power==0 everywhere -> log10(eps) * DCT row sums.
    fb_feat = np.full((20,), np.log10(np.finfo(np.float32).eps), np.float64)
    expected = scipy.fft.dct(fb_feat, type=2, norm="ortho")
    np.testing.assert_allclose(sf[:20], expected, atol=1e-3)
    np.testing.assert_allclose(sf[20:], 0.0, atol=1e-4)


def test_stft_power(wav):
    ours = np.asarray(STFT()(jnp.asarray(wav)))
    x = torch.from_numpy(wav.copy())
    x[:, 1:] = x[:, 1:] - 0.97 * x[:, :-1]
    spec = torch.stft(x, 512, 160, 320, window=torch.hamming_window(320),
                      onesided=True, pad_mode="constant", return_complex=True)
    oracle = spec.abs().pow(2).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, oracle, atol=2e-2, rtol=1e-3)


def test_dct_matrix_roundtrip():
    g = np.random.default_rng(3)
    x = g.standard_normal((5, 20)).astype(np.float32)
    for norm in (None, "ortho"):
        M = dsp.dct_matrix(20, "dct", norm=norm)
        Mi = dsp.dct_matrix(20, "idct", norm=norm)
        np.testing.assert_allclose((x @ M) @ Mi, x, atol=1e-4)
        oracle = scipy.fft.dct(x.astype(np.float64), type=2, norm=norm, axis=-1)
        np.testing.assert_allclose(x @ M, oracle, atol=1e-3, rtol=1e-4)


def test_dct1_matches_scipy():
    g = np.random.default_rng(4)
    x = g.standard_normal((4, 16))
    M = dsp.dct_matrix(16, "dct1")
    oracle = scipy.fft.dct(x, type=1, axis=-1)
    np.testing.assert_allclose(x @ M, oracle, atol=1e-3, rtol=1e-4)
    Mi = dsp.dct_matrix(16, "idct1")
    np.testing.assert_allclose((x @ M) @ Mi, x, atol=1e-4)


def test_mulaw_roundtrip():
    g = np.random.default_rng(5)
    x = jnp.asarray(np.clip(g.standard_normal(1000) * 0.3, -0.999, 0.999), dtype=jnp.float32)
    enc = dsp.mulaw_encode(x, 256)
    dec = dsp.mulaw_decode(enc, 256)
    x_np = np.asarray(x)
    err = np.abs(np.asarray(dec) - x_np)
    # mu-law quantization error grows with amplitude: ~(1+mu|x|)ln(1+mu)/(mu*255)
    bound = 1.1 * (1 + 255 * np.abs(x_np)) * np.log(256) / (255 * 255) + 1e-6
    assert np.all(err <= bound)


def test_alaw_roundtrip():
    g = np.random.default_rng(6)
    x = jnp.asarray(np.clip(g.standard_normal(1000) * 0.3, -0.999, 0.999), dtype=jnp.float32)
    y = dsp.alaw_encode(x)
    back = dsp.alaw_decode(y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_melspec_shape():
    g = np.random.default_rng(8)
    wav = g.standard_normal((2, 16000)).astype(np.float32)
    out = np.asarray(Melspec()(jnp.asarray(wav)))
    assert out.shape == (2, 128, 126)
    assert np.all(out >= 0)
