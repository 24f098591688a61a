"""Pin the sf0 ABSOLUTE lag law via the pitch-sharpening echo.

With the code fixed at track-0 index 256 (two coincident +1 pulses at
position 0) and everything else zero, the only lag-dependent artifact
in subframe 0 is the periodicity-enhancement echo
code[i] += 0.85*code[i-T0_int] (visible iff T0_int < 64 at 12.8 kHz).
Sweeping the 9 sf0 lag bits {10,11,12,13,14,46,69,79,91} and locating
the echo peak therefore reads the integer part of the absolute lag law
directly, and tells us which lag settings give an echo-free subframe 0
(T0_int >= 64) for clean codebook re-sweeps.
"""

import json
import os

import numpy as np

import wb

HERE = os.path.dirname(os.path.abspath(__file__))
LAG0 = [10, 11, 12, 13, 14, 46, 69, 79, 91]
T0 = [109, 125, 129, 157, 161, 189, 193, 221, 225]


def frame(lagv, codev=256):
    bits = [0] * wb.BITS
    for i, b in enumerate(LAG0):
        if (lagv >> (len(LAG0) - 1 - i)) & 1:
            bits[b] = 1
    for i, b in enumerate(T0):
        if (codev >> (len(T0) - 1 - i)) & 1:
            bits[b] = 1
    return bits


def main():
    base = wb.decode_bits([frame(0)])[:160]
    h = base[:160] / 2.0
    N = 512
    H = np.fft.rfft(h, N)
    eps = 1e-3 * np.abs(H).max()

    def deconv(r):
        R = np.fft.rfft(r, N)
        return np.fft.irfft(R * np.conj(H) / (np.abs(H) ** 2 + eps ** 2),
                            N)[:120]

    rows = {}
    # single bits then a ladder of joint values over the full 9-bit range
    vals = sorted(set([1 << k for k in range(9)] +
                      [v for v in range(0, 512, 16)] + [511]))
    for v in vals:
        r = wb.decode_bits([frame(v)])[:160]
        d = deconv(r)
        d[0] = 0  # main pulse
        peak = int(np.argmax(np.abs(d)))
        rows[v] = (peak, round(float(d[peak]), 3),
                   round(float(np.linalg.norm(r - base) /
                              np.linalg.norm(base)), 3))
        print(f"lag v={v:3d} echo@{peak:3d} amp {d[peak]:+.3f} "
              f"dBase {rows[v][2]:.3f}")
    with open(os.path.join(HERE, "learned", "lag0_echo.json"), "w") as f:
        json.dump(rows, f)


if __name__ == "__main__":
    main()
