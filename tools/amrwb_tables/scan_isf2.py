"""ISF table scan, v2: single-application probing.

scan_isf.py's converged-state protocol fails for indices where the MA
predictor + ISF reorder forms a limit cycle (e.g. f2a=32 never
converges).  v2 applies the index ONCE on top of a converged base:

  frames: 4x index-0 (converged, r_hat = r_0) ; frame5 = index I with
  a +2 code burst in SUBFRAME 3 (full new-ISF interpolation weight);
  frame6 = index I (ring-out continues under ~the same LP).

  isf(frame5) - isf(converged base) = r_I - r_0  exactly (MA(1)),
  with no convergence requirement.  Lags are parked high (sf0/sf2 abs
  index 300 -> T=109) so no subframe sharpens its code.

Fitting: time-domain complex-transfer fit (see scan_isf.fit_time) on
the window [sf3 of frame5 .. end of frame6] (400 samples at 16 kHz).
Writes learned/isf_meas2.npz.
"""

from __future__ import annotations

import os
import sys

import numpy as np

import wb
import isf_lab as L
import isf_param as P
import scan_isf as S

HERE = os.path.dirname(os.path.abspath(__file__))
LAG_SF0 = [10, 11, 12, 13, 14, 46, 69, 79, 91]
LAG_SF2 = [15, 16, 17, 18, 19, 51, 70, 80, 92]
SF3_CODE_BIT = 121           # sf3 track0 v=256: +2 @ sf3 position 0
GAIN_SF3 = [b + 3 for b in L.GAIN0]
WARM = 4
NF = 4096
FREQS = np.arange(NF // 2 + 1) / NF * 16000
OM = np.clip(2 * np.pi * FREQS / 12800, 0, np.pi)
LOW = FREQS < 6200
WIN = 400                    # sf3 of frame5 (80) + frame6 (320)


def evec(a):
    return np.exp(-1j * np.outer(OM, np.arange(len(a)))) @ a


def lpwin(x):
    X = np.fft.rfft(x, NF)
    X[~LOW] = 0
    return np.fft.irfft(X, NF)[:WIN]


def frames_for(assign):
    isf0 = L.isf_bits({})
    isfI = L.isf_bits(assign)
    burst = list(isfI)
    for i, b in enumerate(LAG_SF0):
        if (300 >> (8 - i)) & 1:
            burst[b] = 1
    for i, b in enumerate(LAG_SF2):
        if (300 >> (8 - i)) & 1:
            burst[b] = 1
    for i, b in enumerate(GAIN_SF3):
        if (L.GAIN_LOUD >> (6 - i)) & 1:
            burst[b] = 1
    burst[SF3_CODE_BIT] = 1
    return [isf0] * WARM + [burst, isfI]


def response(assign):
    out = wb.decode_bits(frames_for(assign))
    start = 320 * WARM + 240
    return out[start: start + WIN]


def fit(rbase, rI_lp, isf_base, coords, init=None, iters=14):
    AB = evec(S.deemph_conv(P.isf_to_a(isf_base)))
    RB = np.fft.rfft(rbase, NF)
    n = len(coords)
    x = np.zeros(n + 2)
    if init is not None:
        x[:n] = np.clip(init, -900, 900)
    nr = np.linalg.norm(rI_lp)

    def model(xv):
        isf = isf_base.copy()
        isf[list(coords)] += xv[:n]
        AI = evec(S.deemph_conv(P.isf_to_a(isf)))
        ratio = AB / AI * (1 - xv[n] * np.exp(-1j * OM)) * np.exp(xv[n + 1])
        ratio[~LOW] = 0
        return np.fft.irfft(RB * ratio, NF)[:WIN]

    def cost(xv):
        m = model(xv)
        if not np.isfinite(m).all():
            return 9.9e9
        return float(np.linalg.norm(m - rI_lp) / nr)

    best_c, best_x = cost(x), x.copy()
    for _ in range(iters):
        m0 = model(x)
        r = m0 - rI_lp
        J = np.zeros((WIN, n + 2))
        for j in range(n + 2):
            dd = x.copy()
            h_ = 0.5 if j < n else 0.01
            dd[j] += h_
            J[:, j] = (model(dd) - m0) / h_
        if not (np.isfinite(J).all() and np.isfinite(r).all()):
            break
        try:
            st, _, _, _ = np.linalg.lstsq(J, -r, rcond=None)
        except np.linalg.LinAlgError:
            break
        st[:n] = np.clip(st[:n], -150, 150)
        sc, ok = 1.0, False
        for _bt in range(6):
            xt = x + sc * st
            xt[:n] = np.clip(isf_base[list(coords)] + xt[:n],
                             40.0, 6350.0) - isf_base[list(coords)]
            c = cost(xt)
            if c < best_c:
                ok = True
                break
            sc *= 0.5
        if not ok:
            break
        x, best_c, best_x = xt, c, xt.copy()
        if np.abs(sc * st).max() < 1e-3:
            break
    return best_x, best_c


FIELD_COORDS = {
    "f1a": list(range(0, 11)),
    "f1b": list(range(7, 16)),
    "f2a": list(range(0, 8)) + [15],
    "f2b": list(range(0, 11)) + [15],
    "f2c": list(range(4, 11)) + [15],
    "f2d": list(range(7, 14)) + [15],
    "f2e": list(range(9, 16)),
}


def ar_init(assign, isf_base):
    a_ar = S.ar_fit(response(assign)[: 320])
    a16a, _ = S.deemph_deconv(a_ar)
    return P.a_to_isf(a16a) - isf_base


def main():
    fields = sys.argv[1:] or list(L.FIELDS)
    rbase = response({})
    a_ar = S.ar_fit(rbase[:320])
    a16b, _ = S.deemph_deconv(a_ar)
    isf_base = P.a_to_isf(a16b)
    print("window-base isf:", np.round(isf_base, 1), flush=True)
    store, diag = {}, {}
    out_path = os.path.join(HERE, "learned", "isf_meas2.npz")
    if os.path.exists(out_path):
        z = np.load(out_path)
        store = {k[4:]: z[k] for k in z.files if k.startswith("isf_")}
        diag = {k[4:]: z[k] for k in z.files if k.startswith("rel_")}
    for f in fields:
        coords = FIELD_COORDS[f]
        n = 1 << len(L.FIELDS[f])
        out = np.zeros((n, 16))
        rels = np.zeros(n)
        out[0] = isf_base
        for idx in range(1, n):
            rI = lpwin(response({f: idx}))
            init = ar_init({f: idx}, isf_base)[coords]
            x, rel = fit(rbase, rI, isf_base, coords, init)
            if rel > 0.08:
                x2, rel2 = fit(rbase, rI, isf_base, coords, None)
                if rel2 < rel:
                    x, rel = x2, rel2
            isf = isf_base.copy()
            isf[coords] += x[:len(coords)]
            out[idx] = isf
            rels[idx] = rel
            if idx % 64 == 0:
                print(f"{f} {idx}/{n} rel={rel:.4f}", flush=True)
        store[f] = out
        diag[f] = rels
        print(f"field {f}: v2 rel median {np.median(rels):.4f} "
              f"p90 {np.percentile(rels, 90):.4f} max {rels.max():.4f}",
              flush=True)
        np.savez(out_path,
                 **{f"isf_{k}": v for k, v in store.items()},
                 **{f"rel_{k}": v for k, v in diag.items()},
                 isf_base=isf_base)
    print("saved", out_path)


if __name__ == "__main__":
    main()
