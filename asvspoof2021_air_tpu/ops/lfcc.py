"""On-device LFCC / STFT / Melspec front-end.

The reference extracts LFCC offline per utterance and caches tensors to disk
(/root/reference/preprocess.py:232-245, feature_extraction.py:61-138). Here the
whole chain — pre-emphasis → framing → windowed DFT → power → linear
filterbank → log10 → ortho DCT-II → Δ/ΔΔ — runs on device over batched padded
waveforms, expressed as matmuls so XLA tiles it onto the MXU. Variable-length
batches are handled with per-utterance frame counts (masked deltas), giving
bit-consistent results with per-utterance extraction.

Canonical configuration (matching /root/reference/dataset.py:13 and
preprocess.py:237): LFCC(fl=320, fs=160, fn=512, sr=16000, filter_num=20).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.ops import dsp


@dataclasses.dataclass(frozen=True)
class LFCCConfig:
    win_length: int = 320        # 'fl' in the reference
    hop_length: int = 160        # 'fs'
    n_fft: int = 512             # 'fn'
    sample_rate: int = 16000     # 'sr'
    n_filters: int = 20          # 'filter_num'
    with_energy: bool = False
    with_emphasis: bool = True
    with_delta: bool = True
    preemph_coef: float = 0.97

    @property
    def output_dim(self) -> int:
        return self.n_filters * (3 if self.with_delta else 1)


class LFCC:
    """Batched LFCC extractor. Call with (B, L) float32 waveforms.

    Constants (windowed DFT matrices, filterbank, DCT matrix) are built once
    in numpy and closed over by the jitted compute, so every invocation is
    pure device work.
    """

    def __init__(self, config: LFCCConfig = LFCCConfig()):
        self.config = config
        C, S = dsp.windowed_dft_matrices(config.win_length, config.n_fft)
        self._dft_real = C
        self._dft_imag = S
        self._fb = dsp.linear_filterbank(
            config.n_fft, config.sample_rate, config.n_filters
        )
        self._dct = dsp.dct_matrix(config.n_filters, "dct", norm="ortho")

    def __call__(
        self, waveforms: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """waveforms: (B, L) -> (B, T, D) with T = 1 + L // hop.

        With ``lengths`` (B,) in samples, trailing frames of shorter
        utterances still get computed (over the zero padding) but the delta
        replicate-boundary follows each utterance's true frame count; use
        :func:`frame_lengths` to mask downstream.
        """
        cfg = self.config
        x = waveforms.astype(jnp.float32)
        if cfg.with_emphasis:
            x = dsp.preemphasis(x, cfg.preemph_coef)
            if lengths is not None:
                # Pre-emphasis over the padded buffer leaks -coef*x[len-1]
                # into sample index `len`, which the final frame's support
                # covers; mask back to zero beyond each true length.
                mask = (
                    jnp.arange(x.shape[1], dtype=jnp.int32)[None, :]
                    < lengths.astype(jnp.int32)[:, None]
                )
                x = jnp.where(mask, x, 0.0)

        frames = dsp.frame_signal(x, cfg.win_length, cfg.hop_length, cfg.n_fft)
        # Two MXU matmuls replace the FFT: |STFT|^2 = (f C)^2 + (f S)^2.
        re = jnp.einsum("btn,nk->btk", frames, self._dft_real)
        im = jnp.einsum("btn,nk->btk", frames, self._dft_imag)
        power = re * re + im * im

        fb_feat = jnp.log10(power @ self._fb + dsp.FLOAT32_EPS)
        lfcc = fb_feat @ self._dct

        if cfg.with_energy:
            energy = jnp.log10(
                jnp.sum(power / cfg.n_fft, axis=-1) + dsp.FLOAT32_EPS
            )
            lfcc = lfcc.at[:, :, 0].set(energy)

        if cfg.with_delta:
            flen = None if lengths is None else self.frame_lengths(lengths)
            d1 = dsp.delta(lfcc, flen)
            d2 = dsp.delta(d1, flen)
            lfcc = jnp.concatenate([lfcc, d1, d2], axis=-1)
        return lfcc

    def frame_lengths(self, lengths: jnp.ndarray) -> jnp.ndarray:
        """Valid frame count per utterance: 1 + floor(len / hop)."""
        return 1 + lengths // self.config.hop_length

    def silence_frame(self) -> np.ndarray:
        """Feature vector of a fully-silent frame, used by the 'silence'
        padding policy (cf. /root/reference/dataset.py:13-16: LFCC of 3200
        zero samples, first frame)."""
        wav = np.zeros((1, 3200), dtype=np.float32)
        out = jax.jit(self.__call__)(jnp.asarray(wav))
        return np.asarray(out[0, 0])


class STFT:
    """Power spectrogram front-end: (B, L) -> (B, T, n_fft//2+1)
    (capability of /root/reference/feature_extraction.py:141-165)."""

    def __init__(self, config: LFCCConfig = LFCCConfig()):
        self.config = config
        C, S = dsp.windowed_dft_matrices(config.win_length, config.n_fft)
        self._dft_real = C
        self._dft_imag = S

    def __call__(self, waveforms: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = waveforms.astype(jnp.float32)
        if cfg.with_emphasis:
            x = dsp.preemphasis(x, cfg.preemph_coef)
        frames = dsp.frame_signal(x, cfg.win_length, cfg.hop_length, cfg.n_fft)
        re = jnp.einsum("btn,nk->btk", frames, self._dft_real)
        im = jnp.einsum("btn,nk->btk", frames, self._dft_imag)
        return re * re + im * im


class Melspec:
    """Mel power spectrogram, librosa conventions (n_fft=512, hop=128,
    centered reflect-pad Hann) — capability of
    /root/reference/feature_extraction.py:168-176. Output (B, n_mels, T)."""

    def __init__(self, sample_rate: int = 16000, n_fft: int = 512,
                 hop_length: int = 128, n_mels: int = 128):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.n_mels = n_mels
        window = np.hanning(n_fft + 1)[:-1].astype(np.float32)  # periodic Hann
        C, S = dsp.windowed_dft_matrices(n_fft, n_fft, window)
        self._dft_real = C
        self._dft_imag = S
        self._fb = dsp.mel_filterbank(n_fft, sample_rate, n_mels)

    def __call__(self, waveforms: jnp.ndarray) -> jnp.ndarray:
        pad = self.n_fft // 2
        x = jnp.pad(waveforms.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
        T = 1 + (x.shape[1] - self.n_fft) // self.hop_length
        idx = (
            np.arange(T, dtype=np.int32)[:, None] * self.hop_length
            + np.arange(self.n_fft, dtype=np.int32)[None, :]
        )
        frames = x[:, idx]
        re = jnp.einsum("btn,nk->btk", frames, self._dft_real)
        im = jnp.einsum("btn,nk->btk", frames, self._dft_imag)
        power = re * re + im * im
        mel = power @ self._fb
        return jnp.transpose(mel, (0, 2, 1))
