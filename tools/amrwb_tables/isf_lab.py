"""Behavioral ISF recovery for AMR-WB 12.65k.

With the code field law pinned (fit_track0.py) we can decode a clean
coincident +2 pulse burst under any ISF index combination and measure
the decoder's synthesis filter directly from the impulse response:

  response(16k) --fft-resample--> 12.8k --covariance LP fit-->
  A(z) (order 16 + deemphasis pole) --> roots --> decoded ISF values.

The MA predictor is converged by repeating the same ISF index for 3
warm-up frames (1st-order predictor, converges geometrically), so
isf_decoded = isf_mean + (1+mu)*residual(index) with a constant mu.
Differences between index combinations then read the dico tables row
by row up to the global (1+mu) scale, which is pinned afterwards from
the predictor's transient (frame-2 vs converged values).

ISF index fields (storage bit sets from FACTS.md, MSB-first order to
be established by probing):
  F1a (8): {1,2,7,8,9,47,48,67}
  F1b (8): {54,58,60,61,62,68,74,76}
  F2a (6): {52,53,55,56,57,65}
  F2b (7): {59,63,64,66,81,82,87}
  F2c (7): {71,75,85,86,89,90,94}
  F2d (5): {93,95,96,97,100}
  F2e (5): {88,101,102,103,104}
"""

from __future__ import annotations

import numpy as np

import wb

FIELDS = {
    "f1a": [1, 2, 7, 8, 9, 47, 48, 67],
    "f1b": [54, 58, 60, 61, 62, 68, 74, 76],
    "f2a": [52, 53, 55, 56, 57, 65],
    "f2b": [59, 63, 64, 66, 81, 82, 87],
    "f2c": [71, 75, 85, 86, 89, 90, 94],
    "f2d": [50, 93, 96, 97, 100],
    "f2e": [88, 101, 102, 103, 104],
}
LAG_ECHO_FREE = [12, 13, 14, 46]     # sf0 abs lag index 120 -> T>=64
GAIN0 = [3, 20, 42, 28, 32, 38, 24]  # sf0 gain bits, MSB-first
GAIN_LOUD = 114
CODE_T0 = [109, 125, 129, 157, 161, 189, 193, 221, 225]


def isf_bits(assign) -> list:
    """Frame bits with the given {field: value} ISF assignment."""
    bits = [0] * wb.BITS
    for name, val in assign.items():
        f = FIELDS[name]
        for i, b in enumerate(f):
            if (val >> (len(f) - 1 - i)) & 1:
                bits[b] = 1
    return bits


def probe_frames(assign, warm=3):
    """warm ISF-only frames + one burst frame (code +2@track0 pos0)."""
    isf = isf_bits(assign)
    burst = list(isf)
    for b in LAG_ECHO_FREE:
        burst[b] = 1
    for i, b in enumerate(GAIN0):
        if (GAIN_LOUD >> (6 - i)) & 1:
            burst[b] = 1
    burst[CODE_T0[0]] = 1  # code v=256: +2 @ position 0
    return [isf] * warm + [burst]


def burst_response(assign, warm=3):
    out = wb.decode_bits(probe_frames(assign, warm))
    return out[320 * warm: 320 * warm + 320]


def resample_to_128(x16, n_out=None):
    """FFT band-limited 5:4 downsample of a windowed response."""
    n = len(x16)
    if n_out is None:
        n_out = n * 4 // 5
    X = np.fft.rfft(x16, 2 * n)           # pad to soften wrap
    m = n_out * 2
    keep = m // 2 + 1
    Y = X[:keep].copy()
    Y[-1] = Y[-1].real if m % 2 == 0 else Y[-1]
    y = np.fft.irfft(Y, m) * (m / (2 * n))
    return y[:n_out]


def lp_from_burst(assign, order=17, warm=3, n16=240):
    """Covariance-method AR fit on the 12.8k burst impulse response.

    Returns (a, relerr): a[0..order] with a[0]=1 such that
    sum_k a_k h[n-k] ~ 0 for n in [order+1, end].
    """
    r16 = burst_response(assign, warm)[:n16]
    h = resample_to_128(r16)
    n = len(h)
    # rows: n from order+1 .. n-1 (skip the impulse onset region)
    rows = range(order + 1, n)
    M = np.array([[h[t - k] for k in range(1, order + 1)] for t in rows])
    y = np.array([h[t] for t in rows])
    a, _, _, _ = np.linalg.lstsq(M, -y, rcond=None)
    pred = M @ a
    rel = np.linalg.norm(pred + y) / np.linalg.norm(y)
    return np.concatenate([[1.0], a]), rel


def isf_from_lp(a17, deemph=0.68):
    """Divide out the deemphasis pole, return sorted angles (Hz @12.8k)
    of the order-16 polynomial's roots (ISP-style frequencies)."""
    # deconvolve (1 - deemph z^-1)^-1 => polynomial multiply by it
    # synthesis = 1/(A16(z) * (1 - d z^-1)) modeled as order-17 A;
    # so A17 = A16 * (1 - d z^-1) => A16 = A17 / (1 - d z^-1)
    a = np.array(a17, float)
    b = np.zeros(len(a) - 1)
    rem = a.copy()
    for i in range(len(b)):
        b[i] = rem[i]
        rem[i + 1] += deemph * b[i]
    # rem[-1] is the division remainder; small if deemph correct
    roots = np.roots(b)
    ang = np.angle(roots)
    freq = np.sort(np.abs(ang)) * 12800 / (2 * np.pi)
    return b, freq, abs(rem[-1])


if __name__ == "__main__":
    for assign in ({}, {"f1a": 1}, {"f1a": 255}, {"f1b": 128}):
        a, rel = lp_from_burst(assign)
        b, freq, remn = isf_from_lp(a)
        print(assign, f"ARfit rel {rel:.2e} deemph-rem {remn:.3f}")
        print("   freqs:", np.round(freq[::2], 1))
