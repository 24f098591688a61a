"""Pin the MR122 relative lag decode (sf1/sf3 6-bit fields) and the
fractional phase convention by direct correlation.

Setup: frame 1. sf0 absolute T0=60 (no in-subframe sharpening echo),
max gc -> clean known pulse cluster at 0..4. sf1: gp=1.0, min gc; its
adaptive vector images the sf0 cluster at position T0(sf1)-40+{0..4},
with sub-sample shape giving frac via the b60 interpolator. Scan
candidate (T0, frac), LS-fit [v_cand, code_sharp_cand], report best.

Mode B does the same for the sf2 ABSOLUTE field (frac convention of
dec_lag6_abs) using the sf0+sf1 history."""

from __future__ import annotations

import numpy as np

import amrnb_dec as D
import extract_exc as X
import oracle
from refit_bad import hz_to_cos, lsp_to_a


def write_field(bits, positions, val):
    for b, v in zip(positions, format(val, f"0{len(positions)}b")):
        bits[b] = int(v)


def abs_idx(T0, frac=0):
    return (T0 - 17) * 6 + frac - 3


def mk(sf1_idx=0, sf2_idx=None, sf3_idx=None, sf0_T0=60,
       gp=(0, 11, 0, 0), gc=(31, 0, 0, 0)):
    bits = [0] * 244
    write_field(bits, D.LAG_BITS[0], abs_idx(sf0_T0))
    write_field(bits, D.LAG_BITS[1], sf1_idx)
    if sf2_idx is not None:
        write_field(bits, D.LAG_BITS[2], sf2_idx)
    if sf3_idx is not None:
        write_field(bits, D.LAG_BITS[3], sf3_idx)
    for k in range(4):
        write_field(bits, D.GP_BITS[k], gp[k])
        write_field(bits, D.GC_BITS[k], gc[k])
    return bits


def extract_n(bits, n_sf):
    ref = oracle.decode_bits(7, [bits])
    d = D.MR122Decoder()
    lsf1, lsf2 = d.lsf_decode(list(bits))
    init = np.array([30000, 26000, 21000, 15000, 8000, 0, -8000,
                     -15000, -21000, -26000]) / 32768.0
    l1, l2 = hz_to_cos(lsf1), hz_to_cos(lsf2)
    lsps = [0.5 * init + 0.5 * l1, l1, 0.5 * l1 + 0.5 * l2, l2]
    inv = X.ChainInverter()
    out = []
    for k in range(n_sf):
        a = lsp_to_a(np.sort(lsps[k])[::-1])
        e, r = inv.fit_exc(a, ref[40 * k: 40 * (k + 1)])
        out.append((e, r))
    return out


def best_lag(e_target, hist, code, t0_range, beta=1.0):
    """Scan (T0, frac); LS-fit gains on [v, code_sharp]; return best."""
    best = None
    for T0 in t0_range:
        for frac in range(-3, 4):
            v = D.pred_lt_6(hist, T0, frac)
            cs = code.copy()
            if T0 < 40:
                for n in range(T0, 40):
                    cs[n] += beta * cs[n - T0]
            M = np.stack([v, cs], 1)
            sol, *_ = np.linalg.lstsq(M, e_target, rcond=None)
            r = float(np.abs(e_target - M @ sol).max())
            if best is None or r < best[0]:
                best = (r, T0, frac, float(sol[0]), float(sol[1]))
    return best


def code_base():
    return D.decode_positions([0] * 10, [0] * 5)


def sweep_sf1():
    print("sf1 relative field sweep (sf0 T0=60, window should be ~55..64)")
    for idx in range(64):
        bits = mk(sf1_idx=idx)
        (e0, r0), (e1, r1) = extract_n(bits, 2)
        hist = np.concatenate([np.zeros(114), e0])
        b = best_lag(e1, hist, code_base(), range(50, 72))
        print(f" idx={idx:2d}: T0={b[1]} frac={b[2]:+d} gp={b[3]:.4f} "
              f"gc={b[4]:.2e} resid={b[0]:.1e} (extract r={max(r0,r1):.0e})",
              flush=True)


def sweep_sf2(idxs):
    print("sf2 absolute field frac check (visible T0 window 36..79)")
    for idx in idxs:
        bits = mk(sf1_idx=0, sf2_idx=idx, gp=(0, 0, 11, 0),
                  gc=(31, 0, 0, 0))
        ex = extract_n(bits, 3)
        e0, e1, e2 = [e for e, _ in ex]
        hist = np.concatenate([np.zeros(74), e0, e1])
        b = best_lag(e2, hist, code_base(), range(36, 80))
        print(f" idx={idx:3d}: T0={b[1]} frac={b[2]:+d} gp={b[3]:.4f} "
              f"resid={b[0]:.1e}", flush=True)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "sf2":
        # indices for T0 36..79 region: idx = (T0-17)*6 + frac - 3
        sw = []
        for T0 in (40, 41, 60):
            for frac in range(-2, 4):
                sw.append(abs_idx(T0, frac))
        sweep_sf2(sw)
    else:
        sweep_sf1()
