"""ISF table scan, v4 (final): the pi2 protocol.

All probes are DIFFERENTIAL (code v=256 minus code v=0 in sf0 of
frame 5) under ROW-0 GAINS everywhere: lavc is fully deterministic, so
the subtraction isolates the code response exactly — the gain-scaled
high band, the code-independent -2@0 ring of every zero frame, and all
predictor side effects cancel. No loud gain row is needed (float
precision is the only floor), which also kills the gain-predictor
boost that contaminated the v3 window with frame-6 bursts.

Frames: 4x zero (converged index-0 state); frame5 = ISF index I +
sf0 code v + sf0 abs lag 120 (echo-free); frame6 = index I again.
Window: frame5 + first half of frame6 (480 samples @16k).  The
response sees the interpolated LP ladder (0.45/0.8/0.96/1.0 and
frame6's (1+mu) continuation), so the measured deltas carry a common
scale factor ~0.9-1.0 x the true rows — absorbed by the codec's
kIsfScale calibration.

Estimator: lowpass 6.2k, 4/5 sinc resample, autocorrelation-method
LPC(16) (spectral-envelope domain, matching the encoder's analysis),
a_to_isf.  Deltas vs the identically-measured base.
"""

from __future__ import annotations

import os
import sys

import numpy as np

import wb
import isf_lab as L
import isf_param as P

HERE = os.path.dirname(os.path.abspath(__file__))
LAG_SF2 = [15, 16, 17, 18, 19, 51, 70, 80, 92]  # abs idx 300 -> T=109
SF3_T0 = [121, 128, 132, 160, 164, 192, 196, 224, 228]
WARM = 4
WOFF = 240                      # window start: subframe 3 of frame 5
WIN = 320                       # sf3 (80) + frame6 first 240
POSITIONS = (0, 3, 7)           # coincident +2 pulse positions


def lp62(x):
    N = 2048
    X = np.fft.rfft(x, N)
    X[int(6200 / 16000 * N):] = 0
    return np.fft.irfft(X, N)[:len(x)]


def lpc_autocorr(x, order=16):
    r = np.array([np.dot(x[:len(x) - k], x[k:]) for k in range(order + 1)])
    r[0] *= 1.0001
    r[0] += 1e-20
    a = np.zeros(order + 1)
    a[0] = 1.0
    e = r[0]
    for m_ in range(1, order + 1):
        acc = r[m_] + np.dot(a[1:m_], r[m_ - 1:0:-1])
        k = -acc / e
        a[1:m_] = a[1:m_] + k * a[m_ - 1:0:-1]
        a[m_] = k
        e *= (1 - k * k)
        if e < 1e-20:
            e = 1e-20
    return a


def vcode(p):
    v = 1 << 8
    for i in range(4):
        b = (p >> i) & 1
        v |= b << (2 * i) | b << (2 * i + 1)
    return v


def frames_for(assign, p):
    isfI = L.isf_bits(assign)
    f5 = list(isfI)
    for i, b in enumerate(LAG_SF2):
        if (300 >> (8 - i)) & 1:
            f5[b] = 1               # T2=109 -> sf3's lag >= 64, no echo
    if p is not None:
        vv = vcode(p)
        for i, b in enumerate(SF3_T0):
            if (vv >> (8 - i)) & 1:
                f5[b] = 1
    return [L.isf_bits({})] * WARM + [f5, isfI]


def diff_response(assign, p):
    s = 320 * WARM + WOFF
    on = wb.decode_bits(frames_for(assign, p))[s: s + WIN]
    off = wb.decode_bits(frames_for(assign, None))[s: s + WIN]
    return lp62(on - off)


def isf_of(assign, p):
    d = diff_response(assign, p)
    h = L.resample_to_128(d, 250)
    return P.a_to_isf(lpc_autocorr(h))


def main():
    fields = sys.argv[1:] or list(L.FIELDS)
    base = {p: isf_of({}, p) for p in POSITIONS}
    out_path = os.path.join(HERE, "learned", "isf_tables.npz")
    store = {}
    if os.path.exists(out_path):
        z = np.load(out_path)
        store = {k: z[k] for k in z.files}
    store["base16"] = np.mean([base[p] for p in POSITIONS], 0)
    for f in fields:
        n = 1 << len(L.FIELDS[f])
        delta = np.zeros((n, 16))
        for idx in range(1, n):
            ds = [isf_of({f: idx}, p) - base[p] for p in POSITIONS]
            delta[idx] = np.mean(ds, 0)
            if idx % 64 == 0:
                print(f"{f} {idx}/{n}", flush=True)
        store[f"delta_{f}"] = delta
        mag = np.abs(delta).mean(0)
        print(f"field {f}: mean |delta| profile {np.round(mag, 1)}",
              flush=True)
        np.savez(out_path, **store)
    print("saved", out_path)


if __name__ == "__main__":
    main()
