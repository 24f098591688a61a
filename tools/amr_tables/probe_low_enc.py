"""Validate the low-mode encoder prototype (amrnb_low_enc.py) against
the in-image lavc `amrnb` decoder: encode test signals per mode, decode
the storage frames on lavc, report reconstruction correlation; also
report how the native decoder replica tracks lavc on the same streams.

Usage: python probe_low_enc.py [mode ...] [--n SAMPLES]
"""

from __future__ import annotations

import sys

import numpy as np

import amrnb_low as L
import amrnb_low_enc as E
import oracle


def speechlike(n=8000, seed=0, f0=110.0):
    rng = np.random.default_rng(seed)
    exc = np.zeros(n)
    t = 0.0
    while t < n:
        exc[int(t)] = 1.0
        t += 8000.0 / f0 * (1.0 + 0.02 * np.sin(t / 700.0))
    exc += 0.02 * rng.standard_normal(n)
    out = np.zeros(n)
    y1 = np.zeros(2)
    y2 = np.zeros(2)
    for i in range(n):
        fa = 650 + 150 * np.sin(2 * np.pi * i / 1900.0)
        fb = 1800 + 300 * np.cos(2 * np.pi * i / 2300.0)
        o = exc[i]
        for (fc, bw, y) in ((fa, 120, y1), (fb, 180, y2)):
            r = np.exp(-np.pi * bw / 8000.0)
            c = 2 * r * np.cos(2 * np.pi * fc / 8000.0)
            o_new = o + c * y[0] - r * r * y[1]
            y[1] = y[0]
            y[0] = o_new
            o = o_new
        out[i] = o
    return out / np.abs(out).max() * 0.35


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 8000
    for a in sys.argv[1:]:
        if a.startswith("--n"):
            n = int(a.split("=")[1])
    modes = args or ["4k75", "5k15", "5k9", "6k7", "7k4", "7k95", "10k2"]
    sig = speechlike(n)
    for mode in modes:
        frames = E.encode(mode, sig)
        lavc = oracle.decode_bits(L.MODE_IDX[mode], frames)
        m = min(n, len(lavc))
        c = np.corrcoef(sig[:m], lavc[:m])[0, 1]
        nat = L.decode(mode, frames)
        mm = min(len(lavc), len(nat))
        den = max(np.dot(lavc[:mm] - nat[:mm], lavc[:mm] - nat[:mm]),
                  1e-12)
        snr = 10 * np.log10(np.dot(lavc[:mm], lavc[:mm]) / den)
        print(f"{mode:>5}: frames={len(frames)} lavc_corr={c:.3f} "
              f"native_vs_lavc={snr:5.1f} dB")


if __name__ == "__main__":
    main()
