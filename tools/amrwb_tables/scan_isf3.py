"""ISF table scan, v3 (production): single-application probe (see
scan_isf2.py) + direct covariance AR fits, averaged over 3 burst
positions.  No Gauss-Newton — the AR fit on the clean sf3-burst window
is unbiased in DIFFERENCES (the chain systematics cancel between a
config and the base measured identically), repeatability 1-15 Hz for
stage-2 and 20-50 Hz for stage-1 rows (probe_rel_gp-era diagnostics).

Writes learned/isf_tables.npz:
  delta_<field>: (2^bits, 16) measured  isf(I) - isf(0)  = r_I - r_0
  base16: the base window ISF estimate (Hz domain; entry 15 is the
  arccos-mapped a16 coefficient).
"""

from __future__ import annotations

import os
import sys

import numpy as np

import wb
import isf_lab as L
import isf_param as P
import scan_isf as S
import scan_isf2 as S2

HERE = os.path.dirname(os.path.abspath(__file__))
SF3_T0 = [121, 128, 132, 160, 164, 192, 196, 224, 228]
POSITIONS = (0, 3, 7)


def vcode(p):
    v = 1 << 8
    for i in range(4):
        b = (p >> i) & 1
        v |= b << (2 * i) | b << (2 * i + 1)
    return v


def response(assign, p):
    frames = S2.frames_for(assign)
    bu = frames[S2.WARM]
    bu[S2.SF3_CODE_BIT] = 0
    vv = vcode(p)
    for i, b in enumerate(SF3_T0):
        if (vv >> (8 - i)) & 1:
            bu[b] = 1
    out = wb.decode_bits(frames)
    return out[320 * S2.WARM + 240: 320 * S2.WARM + 240 + S2.WIN]


def lpc_autocorr(x, order=16):
    """Autocorrelation-method LPC: fits the SPECTRAL ENVELOPE, which
    absorbs the chain's numerator wavelet into the poles and puts the
    tables in the same domain as a standard encoder's LP analysis."""
    r = np.array([np.dot(x[:len(x) - k], x[k:]) for k in range(order + 1)])
    r[0] *= 1.0001
    r[0] += 1e-12
    a = np.zeros(order + 1)
    a[0] = 1.0
    e = r[0]
    for m_ in range(1, order + 1):
        acc = r[m_] + np.dot(a[1:m_], r[m_ - 1:0:-1])
        k = -acc / e
        a[1:m_] = a[1:m_] + k * a[m_ - 1:0:-1]
        a[m_] = k
        e *= (1 - k * k)
    return a


def isf_ar(assign, p):
    r = response(assign, p)
    h = L.resample_to_128(r, 300)
    return P.a_to_isf(lpc_autocorr(h))


def main():
    fields = sys.argv[1:] or list(L.FIELDS)
    base = {p: isf_ar({}, p) for p in POSITIONS}
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
            ds = [isf_ar({f: idx}, p) - base[p] for p in POSITIONS]
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
