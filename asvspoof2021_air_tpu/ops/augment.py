"""On-device channel augmentation: IR convolution, companding, band-limiting,
level normalization — the jittable tier of the channel-simulation capability
(/root/reference/channel_simulation/*).

The reference shells out per (file, codec) to an external tool
(simulated_channel.py:52-56 etc.), materializing augmented corpora offline.
Here the linear and companding parts of that chain run on device, batched,
inside the training step: every utterance in a batch can draw a random
channel each step (a strictly richer augmentation distribution than the
reference's fixed offline copies). True lossy codecs (AMR/SILK/mp3/aac) are
approximated on device by their dominant linear effects (band-limit, 8k
resample round-trip, companding quantization, bitrate-shaped noise); the
bit-exact host-side C++ codec tier (native/) covers exact G.711/G.726.

All functions are jit-safe with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.ops import dsp


# ---------------------------------------------------------------------------
# Impulse-response convolution (device/space simulation, C3 equivalent)
# ---------------------------------------------------------------------------

def ir_convolve(waves: jnp.ndarray, irs: jnp.ndarray,
                ir_idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Batched FFT convolution with an impulse-response bank.

    waves: (B, L); irs: (N, K) bank; ir_idx: (B,) selects one IR per
    utterance (defaults to IR 0 for all). Returns the first L samples of the
    linear convolution (the acoustic-simulator truncates likewise).
    """
    B, L = waves.shape
    K = irs.shape[-1]
    if ir_idx is not None:
        sel = irs[ir_idx]  # (B, K)
    else:
        sel = jnp.broadcast_to(irs[:1], (B, K))
    n = int(2 ** np.ceil(np.log2(L + K - 1)))
    W = jnp.fft.rfft(waves, n=n, axis=-1)
    H = jnp.fft.rfft(sel, n=n, axis=-1)
    out = jnp.fft.irfft(W * H, n=n, axis=-1)[:, :L]
    return out.astype(waves.dtype)


# ---------------------------------------------------------------------------
# Level normalization (C2's norm[rms=L] stage)
# ---------------------------------------------------------------------------

def rms_normalize(waves: jnp.ndarray, target_dbfs: jnp.ndarray,
                  lengths: Optional[jnp.ndarray] = None,
                  eps: float = 1e-12) -> jnp.ndarray:
    """Scale each utterance so its RMS level is target_dbfs (dB full scale),
    e.g. -26/-29/-32/-35 as sampled by the compression pipeline
    (/root/reference/channel_simulation/simulated_compression.py:13,26)."""
    if lengths is None:
        ms = jnp.mean(waves ** 2, axis=-1)
    else:
        mask = (
            jnp.arange(waves.shape[-1])[None, :] < lengths[:, None]
        ).astype(waves.dtype)
        ms = jnp.sum((waves * mask) ** 2, axis=-1) / jnp.maximum(
            lengths.astype(waves.dtype), 1.0
        )
    rms = jnp.sqrt(ms + eps)
    target = 10.0 ** (jnp.asarray(target_dbfs, waves.dtype) / 20.0)
    return waves * (target / rms)[:, None]


# ---------------------------------------------------------------------------
# Sample-rate round trip (narrowband telephony path)
# ---------------------------------------------------------------------------

def _lowpass_kernel(cutoff: float, sr: int, taps: int = 127) -> np.ndarray:
    """Hamming-windowed-sinc low-pass FIR."""
    t = np.arange(taps) - (taps - 1) / 2.0
    h = 2.0 * cutoff / sr * np.sinc(2.0 * cutoff / sr * t)
    h *= np.hamming(taps)
    return (h / h.sum()).astype(np.float32)


_NB_LP = _lowpass_kernel(3400.0, 16000)   # narrowband anti-alias (300-3400 band)
_WB_LP = _lowpass_kernel(7000.0, 16000)   # wideband codecs (50-7000)
_HP_300 = None  # built lazily


def _highpass_300() -> np.ndarray:
    global _HP_300
    if _HP_300 is None:
        lp = _lowpass_kernel(300.0, 16000)
        hp = -lp
        hp[(len(lp) - 1) // 2] += 1.0
        _HP_300 = hp.astype(np.float32)
    return _HP_300


def fir_filter(waves: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Same-length FIR filtering via conv (delay-compensated)."""
    k = jnp.asarray(kernel)[::-1]
    pad = (len(kernel) - 1) // 2
    x = jnp.pad(waves, ((0, 0), (pad, len(kernel) - 1 - pad)))
    return jax.lax.conv_general_dilated(
        x[:, None, :], k[None, None, :], window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :]


def telephony_bandlimit(waves: jnp.ndarray, wideband: bool = False) -> jnp.ndarray:
    """300-3400 Hz (narrowband) or 50-7000 Hz (wideband) band-limiting, the
    dominant linear effect of the G.7xx/AMR/SILK telephony chains."""
    lp = _WB_LP if wideband else _NB_LP
    out = fir_filter(waves, lp)
    if not wideband:
        out = fir_filter(out, _highpass_300())
    return out


# ---------------------------------------------------------------------------
# Companding quantization (G.711 on-device simulation)
# ---------------------------------------------------------------------------

def g711_sim(waves: jnp.ndarray, law: str = "u") -> jnp.ndarray:
    """G.711 u-law/A-law round trip: band-limit + 8-bit companded
    quantization (on-device approximation; the native tier is bit-exact)."""
    x = telephony_bandlimit(waves)
    x = jnp.clip(x, -1.0, 1.0)
    if law == "u":
        enc = dsp.mulaw_encode(x, 256, scale_to_int=True)
        return dsp.mulaw_decode(enc, 256, input_int=True)
    comp = dsp.alaw_encode(x)
    q = jnp.round(comp * 127.0) / 127.0
    return dsp.alaw_decode(q)


def bitrate_noise(waves: jnp.ndarray, rng: jax.Array, snr_db: jnp.ndarray) -> jnp.ndarray:
    """Quantization-noise proxy for lossy codecs: additive noise at a
    bitrate-dependent SNR, shaped by the signal envelope."""
    noise = jax.random.normal(rng, waves.shape, waves.dtype)
    sig_pow = jnp.mean(waves ** 2, axis=-1, keepdims=True) + 1e-12
    snr = 10.0 ** (jnp.asarray(snr_db, waves.dtype)[:, None] / 10.0)
    scale = jnp.sqrt(sig_pow / snr)
    return waves + noise * scale


# ---------------------------------------------------------------------------
# Channel augmenter: per-utterance random channel under jit
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ChannelFamily:
    """Parametric on-device stand-in for one codec family."""
    name: str
    wideband: bool
    law: Optional[str]       # 'u'|'a' for companded families
    snr_db: float            # bitrate-shaped noise level (inf = none)


# Family table covering the reference codec vocabulary's effect classes
# (landline G.7xx, VoIP SILK, cellular AMR, common; simulated_channel.py:19-38).
CHANNEL_FAMILIES: Tuple[ChannelFamily, ...] = (
    ChannelFamily("clean", True, None, np.inf),
    ChannelFamily("g711u", False, "u", np.inf),
    ChannelFamily("g711a", False, "a", np.inf),
    ChannelFamily("g726", False, None, 28.0),
    ChannelFamily("amr_nb", False, None, 22.0),
    ChannelFamily("amr_wb", True, None, 26.0),
    ChannelFamily("silk_nb", False, None, 24.0),
    ChannelFamily("silk_wb", True, None, 28.0),
    ChannelFamily("g722", True, None, 30.0),
    ChannelFamily("gsmfr", False, None, 20.0),
)


class ChannelAugmenter:
    """Applies a per-utterance random channel transform inside jit.

    Built from a family table and an optional IR bank; one lax.switch per
    family keeps the compiled program static while every utterance draws its
    own channel. Returns (augmented_waves, family_idx, ir_idx).
    """

    def __init__(self, families: Sequence[ChannelFamily] = CHANNEL_FAMILIES,
                 ir_bank: Optional[np.ndarray] = None):
        self.families = tuple(families)
        self.ir_bank = None if ir_bank is None else jnp.asarray(ir_bank)

    def __call__(self, waves: jnp.ndarray, rng: jax.Array,
                 apply_ir: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        B = waves.shape[0]
        k_fam, k_noise, k_ir = jax.random.split(rng, 3)
        fam_idx = jax.random.randint(k_fam, (B,), 0, len(self.families))

        def apply_family(i, fam):
            out = waves
            if fam.name != "clean":
                out = telephony_bandlimit(out, wideband=fam.wideband)
            if fam.law is not None:
                out = g711_sim(out, fam.law)
            if np.isfinite(fam.snr_db):
                out = bitrate_noise(out, jax.random.fold_in(k_noise, i),
                                    jnp.full((B,), fam.snr_db, waves.dtype))
            return out

        branches = [
            (lambda fam=fam, i=i: apply_family(i, fam))
            for i, fam in enumerate(self.families)
        ]
        # Per-family computation, then per-utterance select: with ~10
        # families this trades FLOPs for a branch-free program (the XLA-
        # friendly formulation; a scalar switch would serialize the batch).
        stacked = jnp.stack([b() for b in branches])  # (F, B, L)
        out = jnp.take_along_axis(
            stacked, fam_idx[None, :, None], axis=0
        )[0]

        ir_idx = jnp.zeros((B,), jnp.int32)
        if apply_ir and self.ir_bank is not None:
            ir_idx = jax.random.randint(k_ir, (B,), 0, self.ir_bank.shape[0])
            out = ir_convolve(out, self.ir_bank, ir_idx)
        return out, fam_idx, ir_idx


def synthetic_ir_bank(n_irs: int = 13, length: int = 512, seed: int = 0,
                      sr: int = 16000) -> np.ndarray:
    """Synthetic device/room IR bank (exponentially decaying noise with a
    direct path), for testing and as a stand-in when the recorded IR corpus
    (channel_simulation/ir-*-file-list.txt inventories) is unavailable."""
    g = np.random.default_rng(seed)
    t = np.arange(length) / sr
    bank = np.zeros((n_irs, length), np.float32)
    for i in range(n_irs):
        decay = np.exp(-t / (0.01 + 0.05 * g.random()))
        tail = g.standard_normal(length) * decay * 0.3
        tail[0] = 1.0
        bank[i] = tail / np.abs(tail).sum()
    return bank
