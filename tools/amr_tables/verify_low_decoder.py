"""End-to-end validation of the low-mode decoder replica
(amrnb_low.LowDecoder) against the lavc amrnb oracle on random
multi-frame streams, per mode.

Random bits exercise every law at once (LSF chain + MA predictor,
lag decode + b60 interpolation, per-mode codebooks, gain VQ + energy
predictor, sharpening, feedback truncation, postfilter chain).

Usage: python verify_low_decoder.py [n_streams] [n_frames]
"""

from __future__ import annotations

import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import amrnb_low as L  # noqa: E402
from oracle import decode_bits  # noqa: E402

FRAME_BITS = {"4k75": 95, "5k15": 103, "5k9": 118, "6k7": 134,
              "7k4": 148, "7k95": 159, "10k2": 204}


def one_stream(args):
    mode, seed, n_frames = args
    rng = np.random.default_rng(seed)
    frames = [list(rng.integers(0, 2, FRAME_BITS[mode]))
              for _ in range(n_frames)]
    ref = decode_bits(L.MODE_IDX[mode], frames)
    got = L.decode(mode, frames)
    out = []
    for f in range(n_frames):
        r = ref[160 * f:160 * (f + 1)]
        g = got[160 * f:160 * (f + 1)]
        e = float(np.dot(r - g, r - g))
        p = float(np.dot(r, r))
        out.append((10.0 * np.log10(p / e) if e > 0 else 99.0,
                    np.abs(r - g).max(), np.abs(r).max()))
    return out


def main():
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    modes = sys.argv[3].split(",") if len(sys.argv) > 3 else \
        list(FRAME_BITS)
    for mode in modes:
        jobs = [(mode, 1000 + i, n_frames) for i in range(n_streams)]
        with ProcessPoolExecutor(max_workers=12) as ex:
            res = list(ex.map(one_stream, jobs))
        per_frame = np.array(res)  # (streams, frames, 3)
        snr = per_frame[:, :, 0]
        print(f"{mode}: SNR/frame median "
              + " ".join(f"{np.median(snr[:, f]):6.1f}"
                         for f in range(n_frames))
              + f"  worst {snr.min():6.1f} dB"
              + f"  max|err| {per_frame[:, :, 1].max():.2e}"
              f" (|ref|max {per_frame[:, :, 2].max():.2f})")


if __name__ == "__main__":
    main()
