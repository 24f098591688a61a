"""Pin the absolute lag law of sf0 (and sf2) via the pitch-sharpening
echo: with a coincident +2 code pulse at position 0 and a loud gain
row, the decoder adds 0.85*code[i-T_int] inside the subframe whenever
T_int < 64 (12.8 kHz).  Fitting the echo delay for every 9-bit lag
index maps idx -> T_int directly over [34, 64); the structure (step
1/4 index per integer lag, location of the fractional bits) then pins
the full law shape.

Echo model per lag value v:
  r_v ~ 2*h + 1.7*shift(h, 1.25*T_int)   (16 kHz samples)
fit by LS over a dense fractional delay grid; h is the echo-free
response (lag index with T_int >= 64) halved.
"""

import json
import os
import sys

import numpy as np

import wb
import isf_lab as L

HERE = os.path.dirname(os.path.abspath(__file__))
LAG_SF0 = [10, 11, 12, 13, 14, 46, 69, 79, 91]
LAG_SF2 = [15, 16, 17, 18, 19, 51, 70, 80, 92]
TRACKS_SF2_BIT = 111  # track0 of sf2: first storage bit => code 256 in sf2


def frame_sf0(lagv):
    bits = [0] * wb.BITS
    for i, b in enumerate(LAG_SF0):
        if (lagv >> (8 - i)) & 1:
            bits[b] = 1
    for i, b in enumerate(L.GAIN0):
        if (L.GAIN_LOUD >> (6 - i)) & 1:
            bits[b] = 1
    bits[L.CODE_T0[0]] = 1
    return bits


def frame_sf2(lagv):
    """Burst in SF2: sf2's gain field is GAIN0+2, code track0 bit 111."""
    bits = [0] * wb.BITS
    for i, b in enumerate(LAG_SF2):
        if (lagv >> (8 - i)) & 1:
            bits[b] = 1
    for i, b in enumerate(L.GAIN0):
        if (L.GAIN_LOUD >> (6 - i)) & 1:
            bits[b + 2] = 1
    bits[TRACKS_SF2_BIT] = 1
    return bits


def response(mk, lagv, warm=2):
    frames = [[0] * wb.BITS] * warm + [mk(lagv)]
    out = wb.decode_bits(frames)
    off = 320 * warm + (160 if mk is frame_sf2 else 0)
    return out[off: off + 120]


def fit_echo(r, h, taus):
    """LS fit r ~ a*h + b*shift(h,tau); return best (tau, b/a, resid)."""
    N = 1024
    H = np.fft.rfft(h, N)
    w = np.arange(len(H)) * 2 * np.pi / N
    best = None
    hh = h[:len(r)]
    for tau in taus:
        sh = np.fft.irfft(H * np.exp(-1j * w * tau), N)[:len(r)]
        A = np.stack([hh, sh]).T
        x, _, _, _ = np.linalg.lstsq(A, r, rcond=None)
        e = np.linalg.norm(r - A @ x)
        if best is None or e < best[0]:
            best = (e, tau, x)
    e, tau, x = best
    return tau, (x[1] / x[0] if abs(x[0]) > 1e-12 else 0.0), \
        e / max(np.linalg.norm(r), 1e-12)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "sf0"
    mk = frame_sf0 if which == "sf0" else frame_sf2
    # echo-free atom: lag idx 180 (well above the T>=64 threshold)
    h = response(mk, 180) / 2.0
    taus = np.arange(34 * 1.25, 64 * 1.25, 0.25 * 1.25)
    rows = {}
    for v in range(512):
        r = response(mk, v)
        tau, ratio, rel = fit_echo(r, h, taus)
        t128 = tau / 1.25
        rows[v] = (round(float(t128), 2), round(float(ratio), 3),
                   round(float(rel), 4))
        if v % 64 == 0:
            print(f"{which} v={v}: T={t128:.2f} amp {ratio:.2f} "
                  f"rel {rel:.3f}", flush=True)
    with open(os.path.join(HERE, "learned", f"lag_abs_{which}.json"),
              "w") as f:
        json.dump(rows, f)
    print("saved", which)


if __name__ == "__main__":
    main()
