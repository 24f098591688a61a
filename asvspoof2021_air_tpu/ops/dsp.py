"""DSP primitives: windows, DCT matrices, filterbanks, framing, companding.

Covers the capabilities of the reference DSP layer
(/root/reference/utils_dsp.py and feature_extraction.py helpers), designed for
XLA: every transform that the reference ran through FFT helpers is expressed
here as a precomputed matrix so the hot path is pure MXU matmuls.

Constant builders return numpy arrays (fed to jit as closed-over constants);
array ops are jnp and jit-safe.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

FLOAT32_EPS = float(np.finfo(np.float32).eps)


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------

def hamming_window(n: int, periodic: bool = True) -> np.ndarray:
    """Hamming window; periodic=True matches torch.hamming_window's default,
    the window used by the reference STFT (/root/reference/feature_extraction.py:110)."""
    denom = n if periodic else n - 1
    k = np.arange(n, dtype=np.float64)
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * k / denom)).astype(np.float32)


# ---------------------------------------------------------------------------
# DCT matrices (types I and II with inverses), applied as x @ M
# ---------------------------------------------------------------------------

def dct_matrix(n: int, kind: str = "dct", norm: str | None = None) -> np.ndarray:
    """Matrix M such that ``x @ M`` applies the requested DCT along the last axis.

    kinds: 'dct1'/'idct1' (type I and inverse), 'dct'/'idct' (type II and its
    inverse, i.e. scaled type III). norm=None or 'ortho'. Matches the
    conventions of the reference's DCT helpers (/root/reference/utils_dsp.py:123-217,
    materialized as a frozen Linear at :220-244) and scipy.fft.dct.
    """
    k = np.arange(n, dtype=np.float64)
    m = k[:, None]  # input index
    if kind == "dct1":
        # X_k = x_0 + (-1)^k x_{n-1} + 2 sum_{j=1}^{n-2} x_j cos(pi j k/(n-1))
        M = 2.0 * np.cos(np.pi * m * k[None, :] / (n - 1))
        M[0, :] = 1.0
        M[-1, :] = (-1.0) ** k
        return M.astype(np.float32)
    if kind == "idct1":
        return (dct_matrix(n, "dct1") / (2.0 * (n - 1))).astype(np.float32)
    if kind == "dct":
        # X_k = 2 sum_j x_j cos(pi (2j+1) k / (2n))
        M = 2.0 * np.cos(np.pi * (2.0 * m + 1.0) * k[None, :] / (2.0 * n))
        if norm == "ortho":
            M[:, 0] /= np.sqrt(n) * 2.0
            M[:, 1:] /= np.sqrt(n / 2.0) * 2.0
        return M.astype(np.float32)
    if kind == "idct":
        fwd = dct_matrix(n, "dct", norm=norm).astype(np.float64)
        return np.linalg.inv(fwd).astype(np.float32)
    raise ValueError(f"unknown DCT kind: {kind}")


# ---------------------------------------------------------------------------
# Linear triangular filterbank (the "LF" in LFCC)
# ---------------------------------------------------------------------------

def trimf(x: np.ndarray, a: float, b: float, c: float) -> np.ndarray:
    """Triangular membership function (Matlab trimf semantics), used to build
    the linear filterbank (/root/reference/feature_extraction.py:16-39)."""
    if not (a <= b <= c):
        raise ValueError("trimf requires a <= b <= c")
    x = np.asarray(x, dtype=np.float64)
    y = np.zeros_like(x)
    if a < b:
        idx = (a < x) & (x < b)
        y[idx] = (x[idx] - a) / (b - a)
    if b < c:
        idx = (b < x) & (x < c)
        y[idx] = (c - x[idx]) / (c - b)
    y[x == b] = 1.0
    return y


def linear_filterbank(n_fft: int, sr: int, n_filters: int) -> np.ndarray:
    """(n_fft//2+1, n_filters) bank of triangular filters on a linear
    frequency scale (/root/reference/feature_extraction.py:77-86)."""
    f = (sr / 2.0) * np.linspace(0.0, 1.0, n_fft // 2 + 1)
    bands = np.linspace(f.min(), f.max(), n_filters + 2)
    fb = np.zeros((n_fft // 2 + 1, n_filters), dtype=np.float64)
    for i in range(n_filters):
        fb[:, i] = trimf(f, bands[i], bands[i + 1], bands[i + 2])
    return fb.astype(np.float32)


def mel_filterbank(n_fft: int, sr: int, n_mels: int, fmin: float = 0.0,
                   fmax: float | None = None, htk: bool = False) -> np.ndarray:
    """(n_fft//2+1, n_mels) Slaney-normalized mel filterbank (librosa
    conventions), backing the Melspec feature
    (/root/reference/feature_extraction.py:168-176)."""
    fmax = sr / 2.0 if fmax is None else fmax

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        if htk:
            return 2595.0 * np.log10(1.0 + f / 700.0)
        f_sp = 200.0 / 3
        mels = f / f_sp
        min_log_hz = 1000.0
        logstep = np.log(6.4) / 27.0
        log_t = f >= min_log_hz
        mels = np.where(log_t, min_log_hz / f_sp + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
        return mels

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        if htk:
            return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
        f_sp = 200.0 / 3
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel,
                        min_log_hz * np.exp(logstep * (m - min_log_mel)),
                        f_sp * m)

    fftfreqs = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fb = np.zeros((n_mels, n_fft // 2 + 1), dtype=np.float64)
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        fb[i] = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2:n_mels + 2] - mel_pts[:n_mels])
    fb *= enorm[:, None]
    return fb.T.astype(np.float32)


# ---------------------------------------------------------------------------
# Windowed-DFT matrices: STFT power spectrum as two matmuls
# ---------------------------------------------------------------------------

def windowed_dft_matrices(
    win_length: int, n_fft: int, window: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT matrices of shape (win_length, n_fft//2+1) with the
    analysis window folded in.

    The reference runs torch.stft with win_length < n_fft, which zero-pads the
    window to n_fft centered (/root/reference/feature_extraction.py:109-111).
    Folding the window and the centering phase offset into the DFT matrix
    turns the whole STFT into ``frames @ C`` / ``frames @ S`` — two MXU
    matmuls over 320-sample frames instead of an FFT over 512 padded samples.
    """
    if window is None:
        window = hamming_window(win_length, periodic=True)
    window = np.asarray(window, dtype=np.float64)
    n_bins = n_fft // 2 + 1
    offset = (n_fft - win_length) // 2  # centered zero-padding of the window
    m = np.arange(win_length, dtype=np.float64)[:, None] + offset
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    phase = 2.0 * np.pi * m * k / n_fft
    C = (window[:, None] * np.cos(phase)).astype(np.float32)
    S = (-window[:, None] * np.sin(phase)).astype(np.float32)
    return C, S


def num_frames(length: int, hop: int) -> int:
    """Frame count of a center-padded STFT: 1 + floor(length / hop)."""
    return 1 + length // hop


def frame_signal(x: jnp.ndarray, win_length: int, hop: int, n_fft: int) -> jnp.ndarray:
    """Extract center-padded analysis frames: (B, L) -> (B, T, win_length).

    Matches torch.stft(center=True, pad_mode='constant') framing: the signal
    is zero-padded by n_fft//2 on both sides; with the window itself centered
    in the n_fft frame, the effective win_length-sample frame t starts at
    ``t*hop - n_fft//2 + (n_fft - win_length)//2`` in signal coordinates.
    """
    B, L = x.shape
    T = num_frames(L, hop)
    start = (n_fft - win_length) // 2 - n_fft // 2  # e.g. 96 - 256 = -160
    pad_left = -start
    pad_right = max(0, (T - 1) * hop + start + win_length - L)
    xp = jnp.pad(x, ((0, 0), (pad_left, pad_right)))
    idx = (
        np.arange(T, dtype=np.int32)[:, None] * hop
        + np.arange(win_length, dtype=np.int32)[None, :]
    )
    return xp[:, idx]


# ---------------------------------------------------------------------------
# Pre-emphasis and deltas
# ---------------------------------------------------------------------------

def preemphasis(x: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """y[n] = x[n] - coef * x[n-1], y[0] = x[0]
    (functional form of /root/reference/feature_extraction.py:105-106)."""
    return jnp.concatenate([x[..., :1], x[..., 1:] - coef * x[..., :-1]], axis=-1)


def delta(x: jnp.ndarray, lengths: jnp.ndarray | None = None) -> jnp.ndarray:
    """First-order delta along the frame axis: out[t] = x[t+1] - x[t-1] with
    replicate padding (/root/reference/feature_extraction.py:41-58).

    x: (B, T, D). With ``lengths`` (B,), replicate padding respects each
    utterance's true frame count so batched variable-length features match
    per-utterance computation exactly.
    """
    B, T, D = x.shape
    # Static shifts instead of (B, T)-index gathers: the row gathers were
    # 4x 0.15 ms/batch of the front-end's device time (TPU trace); shifts
    # fuse to cheap copies. Only the per-utterance boundary row needs a
    # (tiny, B-row) gather in the variable-length case.
    prv_x = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    nxt_x = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    if lengths is not None:
        last = (lengths - 1).astype(jnp.int32)
        x_last = jax.vmap(lambda xi, i: xi[i])(x, last)      # (B, D)
        t = jnp.arange(T, dtype=jnp.int32)
        keep = t[None, :, None] < last[:, None, None]
        nxt_x = jnp.where(keep, nxt_x, x_last[:, None, :])
    return nxt_x - prv_x


# ---------------------------------------------------------------------------
# Companding and quantization utilities
# ---------------------------------------------------------------------------

def label_2_float(x, bits: int):
    """Integer code -> float in [-1, 1] (/root/reference/utils_dsp.py:30-44)."""
    return 2.0 * x / (2.0 ** bits - 1.0) - 1.0


def float_2_label(x, bits: int):
    """Float wav -> integer code, peak-normalizing if |x|>1
    (/root/reference/utils_dsp.py:47-66)."""
    peak = jnp.max(jnp.abs(x))
    x = jnp.where(peak > 1.0, x / peak, x)
    x = (x + 1.0) * (2.0 ** bits - 1.0) / 2.0
    return jnp.clip(x, 0.0, 2.0 ** bits - 1.0)


def mulaw_encode(x: jnp.ndarray, quantization_channels: int, scale_to_int: bool = True):
    """mu-law companding of float waveforms in (-1, 1)
    (/root/reference/utils_dsp.py:69-92)."""
    mu = float(quantization_channels - 1)
    x = x.astype(jnp.float32)
    x_mu = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    if scale_to_int:
        x_mu = ((x_mu + 1) / 2 * mu + 0.5).astype(jnp.int32)
    return x_mu


def mulaw_decode(x_mu: jnp.ndarray, quantization_channels: int, input_int: bool = True):
    """Inverse mu-law (/root/reference/utils_dsp.py:95-113)."""
    mu = float(quantization_channels - 1)
    x_mu = x_mu.astype(jnp.float32)
    x = (x_mu / mu) * 2 - 1.0 if input_int else x_mu
    return jnp.sign(x) * (jnp.exp(jnp.abs(x) * jnp.log1p(mu)) - 1.0) / mu


def alaw_encode(x: jnp.ndarray, A: float = 87.6):
    """A-law companding (G.711 alaw characteristic), float in/out."""
    ax = jnp.abs(x)
    inv_log = 1.0 / (1.0 + jnp.log(A))
    y = jnp.where(ax < 1.0 / A, A * ax * inv_log, (1.0 + jnp.log(A * jnp.maximum(ax, 1.0 / A))) * inv_log)
    return jnp.sign(x) * y


def alaw_decode(y: jnp.ndarray, A: float = 87.6):
    """Inverse A-law companding, float in/out."""
    ay = jnp.abs(y)
    log1pA = 1.0 + jnp.log(A)
    x = jnp.where(
        ay < 1.0 / log1pA,
        ay * log1pA / A,
        jnp.exp(ay * log1pA - 1.0) / A,
    )
    return jnp.sign(y) * x
