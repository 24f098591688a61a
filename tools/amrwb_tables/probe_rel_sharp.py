"""Pin the sf1/sf3 RELATIVE lag law via the pitch-sharpening echo,
exactly like probe_lag_abs.py does for sf0/sf2 — but with the code
burst in the RELATIVE subframe itself.

Frame: sf0 abs lag = known T0 (swept), no sf0 code; sf1 loud gain row
(GAIN0+1 bits) + coincident +2 code at sf1 position 0 (storage bit
113) + sf1 rel lag index swept.  Subframe 1's pitch sharpening echoes
its own code at +T1_int iff T1_int < 64, with zero adaptive pollution
(sf0's excitation is silent).  The echo position maps
(T0, rel_idx) -> T1_int.
"""

import json
import os
import sys

import numpy as np

import wb
import isf_lab as L

HERE = os.path.dirname(os.path.abspath(__file__))
LAG_SF0 = [10, 11, 12, 13, 14, 46, 69, 79, 91]
REL_SF1 = [36, 49, 72, 77, 83, 98]
GAIN_SF1 = [b + 1 for b in L.GAIN0]
SF1_CODE_BIT = 113  # sf1 track0 value 256: +2 @ sf1 position 0


def frame(t0_idx, rel_idx):
    bits = [0] * wb.BITS
    for i, b in enumerate(LAG_SF0):
        if (t0_idx >> (8 - i)) & 1:
            bits[b] = 1
    for i, b in enumerate(GAIN_SF1):
        if (L.GAIN_LOUD >> (6 - i)) & 1:
            bits[b] = 1
    for i, b in enumerate(REL_SF1):
        if (rel_idx >> (5 - i)) & 1:
            bits[b] = 1
    bits[SF1_CODE_BIT] = 1
    return bits


def resp(t0_idx, rel_idx, warm=2):
    frames = [[0] * wb.BITS] * warm + [frame(t0_idx, rel_idx)]
    # sf1 output starts at 16k sample 80 of the frame
    return wb.decode_bits(frames)[320 * warm + 80: 320 * warm + 240]


def main():
    out = {}
    for t0_idx in (int(sys.argv[1]),) if len(sys.argv) > 1 else \
            (40, 80, 120, 160, 200):
        # echo-free atom: a rel idx whose T1 lands >= 64 is unknown a
        # priori; use the median response over a few indices as a seed,
        # then the atom = response with the weakest self-similarity...
        # simpler: fit echo delay with the response at the SAME t0 whose
        # echo (if any) differs; use h from rel_idx with max T1 later.
        # Start: collect all 64 responses.
        R = np.stack([resp(t0_idx, i) for i in range(64)])
        # atom candidates: each response; an echo-free one maximizes fit
        # quality across the set. Use the response with smallest energy
        # beyond sample 45 (echo region) relative to its head.
        tail = np.linalg.norm(R[:, 60:], axis=1) / \
            np.linalg.norm(R[:, :45], axis=1)
        h = R[int(np.argmin(tail))] / 2.0
        N = 2048
        H = np.fft.rfft(h, N)
        w = np.arange(len(H)) * 2 * np.pi / N
        taus = np.arange(30 * 1.25, 64 * 1.25, 0.25 * 1.25)
        row = {}
        for i in range(64):
            best = None
            for tau in taus:
                sh = np.fft.irfft(H * np.exp(-1j * w * tau), N)[:R.shape[1]]
                A = np.stack([h[:R.shape[1]], sh]).T
                x, _, _, _ = np.linalg.lstsq(A, R[i], rcond=None)
                e = np.linalg.norm(R[i] - A @ x)
                if best is None or e < best[0]:
                    best = (e, tau, x)
            e, tau, x = best
            amp = x[1] / x[0] if abs(x[0]) > 1e-12 else 0.0
            row[i] = (round(float(tau / 1.25), 2), round(float(amp), 3),
                      round(float(e / np.linalg.norm(R[i])), 4))
        out[t0_idx] = row
        echoing = [(i, v[0]) for i, v in row.items() if 0.5 < v[1] < 1.2]
        print(f"T0 idx {t0_idx} (T={34 + t0_idx / 4}): "
              f"{len(echoing)} echoing; sample:",
              echoing[:8], flush=True)
    with open(os.path.join(HERE, "learned", "rel_sharp_sf1.json"),
              "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
