"""Pin the WB sf1 relative-lag law: sweep all 64 values of the 6-bit
lag field {49,72,36,77,83,98} (MSB-order hypothesis refined here) on
the loud-burst base, and estimate the adaptive-read delay per index by
FFT-upsampled cross-correlation of subframe 1's output against the
delayed base. Output delays live on a 5/16-output-sample grid (1/4
fractional lags at 12.8 kHz upsampled 5/4). Writes
learned/lag_law_sf1.json.
"""

from __future__ import annotations

import json
import os

import numpy as np

import wb

HERE = os.path.dirname(os.path.abspath(__file__))
GAIN_SF0 = [3, 20, 42, 28, 32, 38, 24]
LAG_SF1 = [49, 72, 36, 77, 83, 98]  # MSB-first hypothesis (by resp. energy)


def set_gain(bits, sf, row):
    for i, b in enumerate(GAIN_SF0):
        bits[b + sf] = (row >> (6 - i)) & 1


def frac_delay(d, base, w0, lo=20.0, hi=300.0, step=0.0625):
    """Delay of d (80 samples at w0) vs the base signal, on a fine grid
    via frequency-domain fractional shifting of the base."""
    n = 1024
    pad = 512
    bp = np.zeros(n)
    seg0 = base[max(0, w0 - pad):w0 + 80]
    bp[:len(seg0)] = seg0
    off = w0 - max(0, w0 - pad)  # d aligns at bp[off]
    D = np.fft.rfft(np.concatenate([d, np.zeros(n - len(d))]))
    B = np.fft.rfft(bp)
    freqs = np.arange(len(B))
    best = (-1e18, None)
    for delta in np.arange(lo, hi, step):
        # base delayed by delta, sampled at window start
        ph = np.exp(-2j * np.pi * freqs * (off - delta) / n)
        seg = np.fft.irfft(B * ph, n=n)[:80]
        nrm = np.linalg.norm(seg)
        if nrm < 1e-12:
            continue
        c = float(np.dot(d, seg)) / nrm
        if abs(c) > best[0]:
            best = (abs(c), float(delta))
    return best[1], best[0] / (np.linalg.norm(d) + 1e-18)


def main():
    base_bits = [0] * wb.BITS
    set_gain(base_bits, 0, 114)
    set_gain(base_bits, 1, 119)
    # base uses lag value 0 -> its own read delay appears in every diff;
    # measure the WINDOW signal itself per lag value instead: subtract a
    # no-adaptive variant (sf1 gain row with minimal gp AND gc).
    quiet = list(base_bits)
    set_gain(quiet, 1, 0)  # row 0: gp 0.012, gc 441 — near-mute sf1
    outq = wb.decode_bits([quiet, [0] * wb.BITS])
    rows = []
    for v in range(64):
        bits = list(base_bits)
        for i, b in enumerate(LAG_SF1):
            bits[b] = (v >> (5 - i)) & 1
        out = wb.decode_bits([bits, [0] * wb.BITS])
        d = out[80:160] - outq[80:160]
        delta, c = frac_delay(d, outq, 80)
        rows.append(dict(v=v, delay=delta, corr=round(float(c), 3)))
        print(f"v {v:2d}: delay {delta:8.3f}  corr {c:.3f}")
    with open(os.path.join(HERE, "learned", "lag_law_sf1.json"),
              "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
