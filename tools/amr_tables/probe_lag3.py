"""Decisive mapping of the MR122 sf0->sf1 relative-lag window.

For controlled sf0 absolute lags (T0, frac), set sf1_idx and find the
oracle's TRUE sf1 (T0, frac) by full-range scan against the extracted
excitation. The resulting map pins how the decoder stores/clips the
previous lag (frac>0 adjustment, clamping, or something else entirely).
"""

from __future__ import annotations

import numpy as np

import amrnb_dec as D
import probe_rel as R


def true_lag(bits, t0_range=range(18, 144)):
    (e0, r0), (e1, r1) = R.extract_n(bits, 2)
    hist = np.concatenate([np.zeros(114), e0])
    code = R.code_base()
    best = None
    for T0 in t0_range:
        for frac in range(-3, 4):
            v = D.pred_lt_6(hist, T0, frac)
            cs = code.copy()
            if T0 < 40:
                for n in range(T0, 40):
                    cs[n] += cs[n - T0]
            M = np.stack([v, cs], 1)
            sol, *_ = np.linalg.lstsq(M, e1, rcond=None)
            r = float(np.abs(e1 - M @ sol).max())
            if best is None or r < best[0]:
                best = (r, T0, frac, float(sol[0]), float(sol[1]))
    return best


def main():
    print("sf0_T0 frac | sf1_idx -> true (T0, frac)  gp_fit  resid")
    for T0 in (30, 55, 60, 90):
        for f0 in (0, 1):
            for idx in (0, 30, 53):
                bits = R.mk(sf1_idx=idx, sf0_T0=T0, gp=(0, 11, 0, 0),
                            gc=(31, 0, 0, 0))
                # overwrite sf0 lag with the chosen frac
                R.write_field(bits, D.LAG_BITS[0], R.abs_idx(T0, f0))
                b = true_lag(bits)
                print(f"  {T0:3d}  {f0:+d}  | {idx:2d} -> ({b[1]:3d},{b[2]:+d})"
                      f"  gp={b[3]:.4f} resid={b[0]:.1e}", flush=True)


if __name__ == "__main__":
    main()
