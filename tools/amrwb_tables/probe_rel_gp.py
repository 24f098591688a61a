"""Pin (a) the sf1/sf3 RELATIVE lag law and (b) the pitch-gain column
of the 7-bit gain VQ, via the adaptive-codebook echo.

Probe: sf0 carries a loud coincident +2 code pulse at position 0 with
abs lag index 160 (T0 = 74, no sharpening since T>=64).  Subframe 1's
excitation is gp * exc[n - T1]; the sf0 pulse therefore reappears at
12.8k sample T1 (inside sf1 iff 64 <= T1 < 128) scaled by gp(sf1 gain
row) and shaped by the fractional-lag interpolation filter.

(a) sweep sf1's 6 relative-lag bits at a fixed high-gp gain row ->
    echo delay vs rel index = the relative law around T0.
(b) sweep sf1's 128 gain rows at fixed rel index -> echo amplitude
    ratios = gp ladder; compare with column 0 of the int16 [128][2]
    table at byte 11372064 of the lavc image.
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
T0_IDX = 160          # T0 = 34 + 160/4 = 74
HIGH_GP_ROW = 127


def probe(rel_idx, gain_row):
    bits = [0] * wb.BITS
    for i, b in enumerate(LAG_SF0):
        if (T0_IDX >> (8 - i)) & 1:
            bits[b] = 1
    for i, b in enumerate(L.GAIN0):
        if (L.GAIN_LOUD >> (6 - i)) & 1:
            bits[b] = 1
    for i, b in enumerate(GAIN_SF1):
        if (gain_row >> (6 - i)) & 1:
            bits[b] = 1
    for i, b in enumerate(REL_SF1):
        if (rel_idx >> (5 - i)) & 1:
            bits[b] = 1
    bits[L.CODE_T0[0]] = 1
    return bits


def resp(rel_idx, gain_row, warm=2):
    frames = [[0] * wb.BITS] * warm + [probe(rel_idx, gain_row)]
    return wb.decode_bits(frames)[320 * warm: 320 * warm + 240]


def main():
    base = resp(0, 0)           # gp(row0) ~ 0: no echo reference
    h2 = base[:120]             # sf0 response = 2*pulse chain
    N = 2048
    H = np.fft.rfft(h2, N)
    w = np.arange(len(H)) * 2 * np.pi / N

    def fit_echo(r, taus):
        d = r - base            # isolate the sf1 echo
        best = None
        for tau in taus:
            sh = np.fft.irfft(H * np.exp(-1j * w * tau), N)[:len(d)]
            num = sh @ d
            den = sh @ sh
            a = num / den
            e = np.linalg.norm(d - a * sh)
            if best is None or e < best[0]:
                best = (e, tau, a)
        e, tau, a = best
        return tau / 1.25, a / 2.0, e / max(np.linalg.norm(d), 1e-12)

    taus = np.arange(50 * 1.25, 100 * 1.25, 0.125 * 1.25)
    laws = {}
    print("== relative lag sweep (gain row", HIGH_GP_ROW, ") ==")
    for idx in range(64):
        T1, amp, rel = fit_echo(resp(idx, HIGH_GP_ROW), taus)
        laws[idx] = (round(float(T1), 3), round(float(amp), 4),
                     round(float(rel), 4))
        if idx % 8 == 0:
            print(f"rel={idx}: T1={T1:.2f} gp~{amp:.3f} res {rel:.3f}",
                  flush=True)
    with open(os.path.join(HERE, "learned", "rel_lag_sf1.json"), "w") as f:
        json.dump(laws, f)

    print("== gp ladder sweep (rel idx 32) ==")
    gps = {}
    for row in range(128):
        T1, amp, rel = fit_echo(resp(32, row), taus)
        gps[row] = (round(float(T1), 3), round(float(amp), 5),
                    round(float(rel), 4))
    with open(os.path.join(HERE, "learned", "gp_ladder.json"), "w") as f:
        json.dump(gps, f)

    LIB = "/usr/lib/x86_64-linux-gnu/libavcodec.so.59.37.100"
    blk = np.fromfile(LIB, np.uint8)[11372064:11372064 + 512] \
        .view(np.int16).reshape(128, 2)
    meas = np.array([gps[r][1] for r in range(128)])
    col0 = blk[:, 0].astype(float)
    ok = meas > 1e-3
    scale = np.median(col0[ok] / meas[ok])
    err = np.abs(col0[ok] - scale * meas[ok]) / np.abs(col0[ok])
    print(f"gp column check: scale {scale:.1f} (Q14={16384}), "
          f"rel err median {np.median(err):.4f} max {err.max():.4f}")


if __name__ == "__main__":
    main()
