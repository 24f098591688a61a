"""On-device channel augmentation: IR convolution, companding, band-limiting,
level normalization — the jittable tier of the channel-simulation capability
(/root/reference/channel_simulation/*).

The reference shells out per (file, codec) to an external tool
(simulated_channel.py:52-56 etc.), materializing augmented corpora offline.
Here the channel chain runs on device, batched, inside the training step:
every utterance in a batch draws a random channel each step (a strictly
richer augmentation distribution than the reference's fixed offline copies).

TPU-native formulation: ALL linear channel effects — telephony band-limiting
and device/room impulse responses — are assembled as one SMALL per-utterance
time-domain kernel (family FIR prototype (*) random IR, combined with a tiny
FFT) and applied with one big rFFT/irFFT pair; wide (B, n_fft/2+1) spectra
only ever appear as FFT products, which the TPU FFT path handles in
microseconds. Time-domain long convolutions are deliberately avoided
(single-channel convs neither hit the MXU nor compile quickly), and so are
integer/bool intermediates and small closed-over constants near matmuls
(both trigger a ~30 ms slow-dispatch path on the axon TPU backend — see
ChannelAugmenter's docstring for the pass-tables-as-arguments rule).
Non-linear effects (companded 8-bit quantization, bitrate-shaped noise) are
elementwise VPU work selected per utterance by float arithmetic masks.

This on-device tier approximates codec families by their dominant effects
(band-limit + feature-matched bitrate noise); the host-side C++ tier
(native/) provides the REAL codecs — bit-exact G.711/G.726, GSM 06.10
RPE-LTP bitstreams, and an analysis-by-synthesis ACELP ladder for
AMR/AMR-WB/SILK/G.729/G.728 (mp3/aac remain effect approximations).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.ops import dsp


def _next_pow2(n: int) -> int:
    return int(2 ** np.ceil(np.log2(max(n, 2))))


# ---------------------------------------------------------------------------
# FIR prototypes (numpy, used only to derive frequency responses)
# ---------------------------------------------------------------------------

def lowpass_fir(cutoff: float, sr: int, taps: int = 127) -> np.ndarray:
    """Hamming-windowed-sinc low-pass FIR prototype."""
    t = np.arange(taps) - (taps - 1) / 2.0
    h = 2.0 * cutoff / sr * np.sinc(2.0 * cutoff / sr * t)
    h *= np.hamming(taps)
    return (h / h.sum()).astype(np.float32)


def bandpass_fir(low: float, high: float, sr: int, taps: int = 127) -> np.ndarray:
    """Band-pass FIR: low-pass(high) minus low-pass(low)."""
    lp_hi = lowpass_fir(high, sr, taps)
    lp_lo = lowpass_fir(low, sr, taps)
    return (lp_hi - lp_lo).astype(np.float32)


def fir_response(fir: np.ndarray, n_fft: int) -> np.ndarray:
    """Zero-phase magnitude-preserving frequency response of an FIR (the
    linear-phase delay is discarded so augmentation doesn't shift audio)."""
    H = np.fft.rfft(fir, n=n_fft)
    return np.abs(H).astype(np.float32)


# ---------------------------------------------------------------------------
# Frequency-domain linear channel application
# ---------------------------------------------------------------------------

def apply_response(waves: jnp.ndarray, H: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """y = irfft(rfft(x) * H)[:L] — batched linear filtering; H (B, NF) or
    (NF,)."""
    L = waves.shape[-1]
    X = jnp.fft.rfft(waves, n=n_fft, axis=-1)
    Y = X * H
    return jnp.fft.irfft(Y, n=n_fft, axis=-1)[..., :L].astype(waves.dtype)


def ir_convolve(waves: jnp.ndarray, irs: jnp.ndarray,
                ir_idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Batched FFT convolution with an impulse-response bank.

    waves: (B, L); irs: (N, K) bank; ir_idx: (B,) selects one IR per
    utterance (defaults to IR 0 for all). Returns the first L samples of the
    linear convolution (the acoustic-simulator truncates likewise).
    """
    B, L = waves.shape
    K = irs.shape[-1]
    sel = irs[ir_idx] if ir_idx is not None else jnp.broadcast_to(irs[:1], (B, K))
    n = _next_pow2(L + K - 1)
    H = jnp.fft.rfft(sel, n=n, axis=-1)
    return apply_response(waves, H, n)


def fir_filter(waves: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Delay-compensated FIR filtering, frequency-domain (TPU-friendly)."""
    L = waves.shape[-1]
    n = _next_pow2(L + len(kernel))
    # keep true (complex) response but undo the linear-phase delay
    H = np.fft.rfft(np.asarray(kernel, np.float64), n=n)
    delay = (len(kernel) - 1) / 2.0
    k = np.arange(H.shape[0])
    H = H * np.exp(2j * np.pi * k * delay / n)
    return apply_response(waves, jnp.asarray(H.astype(np.complex64)), n)


def telephony_bandlimit(waves: jnp.ndarray, wideband: bool = False) -> jnp.ndarray:
    """300-3400 Hz (narrowband) or 50-7000 Hz (wideband) band-limiting, the
    dominant linear effect of the G.7xx/AMR/SILK telephony chains."""
    if wideband:
        fir = lowpass_fir(7000.0, 16000)
    else:
        fir = bandpass_fir(300.0, 3400.0, 16000)
    return fir_filter(waves, fir)


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
# Companding quantization (G.711 on-device simulation, elementwise)
# ---------------------------------------------------------------------------

def mulaw_quantize(x: jnp.ndarray) -> jnp.ndarray:
    """8-bit mu-law companded quantization round trip (no band-limit; combine
    with telephony_bandlimit / ChannelAugmenter's response stage).

    Float-only formulation (floor-based rounding instead of an int cast) so
    augmentation programs stay integer-free."""
    x = jnp.clip(x, -1.0, 1.0)
    mu = 255.0
    x_mu = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    code = jnp.floor((x_mu + 1.0) / 2.0 * mu + 0.5)  # same as int cast
    x_back = (code / mu) * 2.0 - 1.0
    return jnp.sign(x_back) * (jnp.exp(jnp.abs(x_back) * jnp.log1p(mu)) - 1.0) / mu


def alaw_quantize(x: jnp.ndarray) -> jnp.ndarray:
    """8-bit A-law companded quantization round trip."""
    x = jnp.clip(x, -1.0, 1.0)
    comp = dsp.alaw_encode(x)
    q = jnp.round(comp * 127.0) / 127.0
    return dsp.alaw_decode(q)


def g711_sim(waves: jnp.ndarray, law: str = "u") -> jnp.ndarray:
    """G.711 u-law/A-law landline hop: band-limit + 8-bit companded
    quantization (on-device approximation; the native tier is bit-exact)."""
    x = telephony_bandlimit(waves)
    return mulaw_quantize(x) if law == "u" else alaw_quantize(x)


def bitrate_noise(waves: jnp.ndarray, rng: jax.Array, snr_db: jnp.ndarray) -> jnp.ndarray:
    """Quantization-noise proxy for lossy codecs: additive noise at a
    bitrate-dependent SNR. snr_db of +inf adds nothing."""
    noise = jax.random.normal(rng, waves.shape, waves.dtype)
    sig_pow = jnp.mean(waves ** 2, axis=-1, keepdims=True) + 1e-12
    snr_db = jnp.asarray(snr_db, waves.dtype)[:, None]
    scale = jnp.where(
        jnp.isfinite(snr_db),
        jnp.sqrt(sig_pow / (10.0 ** (snr_db / 10.0))),
        0.0,
    )
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
# snr_db values are FEATURE-MATCHED against the native real-codec tier: the
# noise level is chosen so the stand-in's LFCC distortion equals the real
# codec family's measured LFCC distortion on a voiced test signal
# (tests/test_acelp.py::test_family_snrs_feature_matched). gsmfr additionally
# matches the real GSM 06.10 waveform SNR (tests/test_gsmfr.py); g722 is
# matched to the real native G.722's measured LFCC distortion across the
# 64/56/48 kbps modes (tests/test_g722.py).
CHANNEL_FAMILIES: Tuple[ChannelFamily, ...] = (
    ChannelFamily("clean", True, None, np.inf),
    ChannelFamily("g711u", False, "u", np.inf),
    ChannelFamily("g711a", False, "a", np.inf),
    ChannelFamily("g726", False, None, 16.5),
    ChannelFamily("amr_nb", False, None, 15.0),
    ChannelFamily("amr_wb", True, None, 18.0),
    ChannelFamily("silk_nb", False, None, 15.0),
    ChannelFamily("silk_wb", True, None, 28.0),
    ChannelFamily("g722", True, None, 37.0),
    ChannelFamily("gsmfr", False, None, 12.2),
)

_LAW_NONE, _LAW_MU, _LAW_A = 0, 1, 2


def _arith_onehot(idx_f: jnp.ndarray, n: int) -> jnp.ndarray:
    """Exact {0,1} one-hot from integer-VALUED float indices using pure float
    arithmetic (max(0, 1-|i-k|)). Keeps programs free of integer/bool
    intermediates, which (together with small inlined constants) trigger a
    ~30 ms slow-dispatch path on the axon TPU backend."""
    k = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(1.0 - jnp.abs(idx_f[:, None] - k[None, :]), 0.0)


class ChannelAugmenter:
    """Applies a per-utterance random channel transform inside jit.

    TPU-native structure: per utterance, a SMALL time-domain channel kernel
    is assembled (family FIR prototype, optionally convolved with a random
    impulse response via a tiny FFT), and applied to the batch with one big
    rFFT/irFFT pair — wide (B, n_fft/2+1) spectra only ever appear as FFT
    products, which the TPU FFT path handles in microseconds. Family/IR
    selection is a float arithmetic one-hot times the (few-row) tables.
    Companding law and noise SNR are per-utterance gathered scalars driving
    elementwise selects.

    IMPORTANT (axon backend): the tables must be passed INTO the jitted
    program as arguments — closing over small device-array constants sends
    the whole program down a ~30 ms slow-dispatch path. Use ``.tables`` and
    pass them through, e.g.::

        tables = aug.tables
        fn = jax.jit(lambda w, k, tb: aug(w, k, apply_ir=True, tables=tb))
        fn(wave, key, tables)

    Calling without ``tables`` closes over them (fine on CPU / in tests).

    Returns (augmented_waves, family_idx_f32, ir_idx_f32).
    """

    N_FFT = 131072  # covers 7.5 s utterances + IR tails
    TAPS = 128      # family FIR prototype length

    def __init__(self, families: Sequence[ChannelFamily] = CHANNEL_FAMILIES,
                 ir_bank: Optional[np.ndarray] = None,
                 n_fft: Optional[int] = None):
        self.families = tuple(families)
        self.n_fft = n_fft or self.N_FFT

        firs, laws, snrs = [], [], []
        for fam in self.families:
            if fam.name == "clean":
                fir = np.zeros(self.TAPS, np.float32)
                fir[self.TAPS // 2] = 1.0  # pure delay (compensated below)
            elif fam.wideband:
                fir = np.zeros(self.TAPS, np.float32)
                proto = lowpass_fir(7000.0, 16000, self.TAPS - 1)
                fir[: self.TAPS - 1] = proto
            else:
                fir = np.zeros(self.TAPS, np.float32)
                proto = bandpass_fir(300.0, 3400.0, 16000, self.TAPS - 1)
                fir[: self.TAPS - 1] = proto
            firs.append(fir)
            laws.append({None: _LAW_NONE, "u": _LAW_MU, "a": _LAW_A}[fam.law])
            # inf encoded as a large sentinel (pure-float programs)
            snrs.append(200.0 if not np.isfinite(fam.snr_db) else fam.snr_db)

        if ir_bank is None:
            ir_np = np.zeros((1, self.TAPS), np.float32)
            ir_np[0, 0] = 1.0
            self._has_ir = False
        else:
            ir_np = np.asarray(ir_bank, np.float32)
            self._has_ir = True
        self.ir_bank = jnp.asarray(ir_np)

        self.tables = {
            "fam_fir": jnp.asarray(np.stack(firs)),          # (F, TAPS)
            "laws": jnp.asarray(np.array(laws, np.float32)),  # (F,)
            "snrs": jnp.asarray(np.array(snrs, np.float32)),  # (F,)
            "irs": self.ir_bank,                              # (N, K)
        }

    def __call__(self, waves: jnp.ndarray, rng: jax.Array,
                 apply_ir: bool = False,
                 tables=None) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        tb = self.tables if tables is None else tables
        B, L = waves.shape
        n_fam = tb["fam_fir"].shape[0]
        n_ir = tb["irs"].shape[0]
        k_fam, k_noise, k_ir = jax.random.split(rng, 3)

        # float-only channel draw: floor(uniform * n)
        fam_f = jnp.floor(
            jax.random.uniform(k_fam, (B,), jnp.float32) * n_fam
        )
        fam_oh = _arith_onehot(fam_f, n_fam)                 # (B, F)
        fir = fam_oh @ tb["fam_fir"]                         # (B, TAPS)

        ir_f = jnp.zeros((B,), jnp.float32)
        kernel = fir
        k_len = self.TAPS
        if apply_ir and self._has_ir:
            ir_f = jnp.floor(
                jax.random.uniform(k_ir, (B,), jnp.float32) * n_ir
            )
            irs = _arith_onehot(ir_f, n_ir) @ tb["irs"]      # (B, K)
            # combine FIR and IR with a small FFT convolution
            m = _next_pow2(self.TAPS + tb["irs"].shape[1])
            K1 = jnp.fft.rfft(fir, n=m, axis=-1)
            K2 = jnp.fft.rfft(irs, n=m, axis=-1)
            kernel = jnp.fft.irfft(K1 * K2, n=m, axis=-1)
            k_len = m
        if L + k_len > self.n_fft:
            raise ValueError(
                f"utterance length {L} too long for augmenter n_fft {self.n_fft}"
            )

        # apply the per-utterance kernel with one big FFT pair; compensate
        # the TAPS/2 prototype delay by rolling the kernel's phase
        H = jnp.fft.rfft(kernel, n=self.n_fft, axis=-1)
        X = jnp.fft.rfft(waves, n=self.n_fft, axis=-1)
        y = jnp.fft.irfft(X * H, n=self.n_fft, axis=-1)
        delay = self.TAPS // 2
        out = y[:, delay:delay + L].astype(waves.dtype)

        # companding law per utterance (arith masks, no bools)
        law = (fam_oh @ tb["laws"])[:, None]                 # (B, 1)
        mu_m = jnp.maximum(1.0 - jnp.abs(law - _LAW_MU), 0.0)
        a_m = jnp.maximum(1.0 - jnp.abs(law - _LAW_A), 0.0)
        out = (1.0 - mu_m - a_m) * out + mu_m * mulaw_quantize(out) \
            + a_m * alaw_quantize(out)

        # bitrate-shaped noise; snr 200 dB sentinel => negligible
        snr = (fam_oh @ tb["snrs"])
        noise = jax.random.normal(k_noise, out.shape, out.dtype)
        sig_pow = jnp.mean(out ** 2, axis=-1, keepdims=True) + 1e-12
        scale = jnp.sqrt(sig_pow / (10.0 ** (snr[:, None] / 10.0)))
        out = out + noise * scale
        return out, fam_f, ir_f


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


def synthesize_device_ir(g: np.random.Generator, length: int = 1024,
                         sr: int = 16000) -> np.ndarray:
    """Loudspeaker/telephone-class impulse response: a handful of damped
    modal resonances (cabinet/driver modes) inside a band-pass envelope —
    the acoustic character of the reference's device IR corpus (small
    speakers, tube radios, telephone horns)."""
    t = np.arange(length) / sr
    ir = np.zeros(length)
    n_modes = g.integers(3, 8)
    lo = g.uniform(150.0, 500.0)          # low roll-off
    hi = g.uniform(2500.0, 7000.0)        # top roll-off
    for _ in range(n_modes):
        f = np.exp(g.uniform(np.log(lo * 1.2), np.log(hi * 0.9)))
        tau = g.uniform(0.5e-3, 6e-3)     # short decays: device resonances
        amp = g.uniform(0.3, 1.0)
        ir += amp * np.sin(2 * np.pi * f * t + g.uniform(0, 2 * np.pi)) * \
            np.exp(-t / tau)
    # band-pass the whole response (cheap FFT brickwall with soft edges)
    spec = np.fft.rfft(ir)
    freqs = np.fft.rfftfreq(length, 1 / sr)
    shape = 1.0 / (1 + (lo / np.maximum(freqs, 1.0)) ** 4)
    shape *= 1.0 / (1 + (freqs / hi) ** 6)
    ir = np.fft.irfft(spec * shape, n=length)
    ir /= np.abs(ir).sum() + 1e-12
    return ir.astype(np.float32)


def synthesize_space_ir(g: np.random.Generator, length: int = 8192,
                        sr: int = 16000) -> np.ndarray:
    """Room-class impulse response: direct path, sparse early reflections,
    then an exponentially decaying diffuse tail at a sampled RT60 — the
    acoustic character of the reference's space IR corpus (small rooms,
    halls, caves)."""
    t = np.arange(length) / sr
    ir = np.zeros(length)
    ir[0] = 1.0
    n_early = g.integers(4, 12)
    for _ in range(n_early):
        d = int(g.uniform(0.002, 0.025) * sr)
        if d < length:
            ir[d] += g.uniform(0.1, 0.6) * g.choice([-1.0, 1.0])
    rt60 = g.uniform(0.08, 0.6)
    tau = rt60 / 6.91                      # ln(1000)
    tail = g.standard_normal(length) * np.exp(-t / tau)
    mix_at = int(0.02 * sr)
    ir[mix_at:] += 0.35 * tail[mix_at:]
    ir /= np.abs(ir).sum() + 1e-12
    return ir.astype(np.float32)
