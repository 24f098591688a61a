"""True constant-Q transform oracle (slow, host-side numpy).

Direct per-bin CQT: every bin k gets its own analysis window of length
N_k = ceil(Q * sr / f_k) (Q = 1/(2^(1/B) - 1)), a Hann-windowed complex
exponential kernel evaluated at the hop grid by FFT correlation. This is the
multi-resolution transform the MATLAB CQCC toolbox builds on, used here as
the numerical oracle bounding the error of the framework's single-window
pseudo-CQT (asvspoof2021_air_tpu/ops/cqcc.py).
"""

import numpy as np


def true_cqt_log_power(x, sr, fmin, n_bins, bins_per_octave, hop,
                       max_kernel=None, eps=1e-10):
    """Log-power CQT: returns (T, n_bins) at frame times t*hop.

    Bins whose kernel would exceed max_kernel (or the signal length) are
    computed with a truncated-at-max kernel — callers restrict comparisons
    to bins with full-resolution kernels via the returned `full` mask.
    """
    q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    centers = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    L = len(x)
    if max_kernel is None:
        max_kernel = L
    T = 1 + L // hop
    frames = np.arange(T) * hop
    out = np.zeros((T, n_bins))
    full = np.zeros(n_bins, bool)

    n_fft = 1
    while n_fft < 2 * L:
        n_fft *= 2
    X = np.fft.fft(x, n_fft)

    for k, fc in enumerate(centers):
        n_k = int(np.ceil(q * sr / fc))
        full[k] = n_k <= max_kernel
        n_k = min(n_k, max_kernel)
        n = np.arange(n_k)
        win = np.hanning(n_k)
        kernel = win * np.exp(2j * np.pi * fc * n / sr) / win.sum()
        # correlation via FFT: y[t] = sum_n x[t + n - n_k//2] * conj(kernel[n])
        K = np.fft.fft(np.conj(kernel[::-1]), n_fft)
        y = np.fft.ifft(X * K)[: L + n_k - 1]
        # y[m] = sum_n x[m - (n_k-1) + n] conj(kernel[n]); center at t*hop:
        idx = frames + n_k - 1 - n_k // 2
        idx = np.clip(idx, 0, len(y) - 1)
        out[:, k] = np.log(np.abs(y[idx]) ** 2 + eps)
    return out, full
