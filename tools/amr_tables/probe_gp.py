"""Pin the MR122 adaptive-codebook gain law: sweep gp_idx with a fixed
sf1 relative lag, LS-fit [pitch vector, sharpened code] on the extracted
excitation, and compare fitted gp against QUA_GAIN_PITCH[idx].

The open anomaly: at gp_idx=11 (table 1.0) the fit returns 0.9962
consistently across all lags/fracs. Determine whether the ratio
fit/table is constant (global scale on v) or index-dependent (different
gain table/units)."""

from __future__ import annotations

import numpy as np

import amrnb_dec as D
import probe_rel as R


def main():
    code = R.code_base()
    print("gp_idx  table      fit_gp     ratio      fit_gc    resid")
    for gi in range(16):
        bits = R.mk(sf1_idx=3, gp=(0, gi, 0, 0), gc=(31, 0, 0, 0))
        (e0, r0), (e1, r1) = R.extract_n(bits, 2)
        hist = np.concatenate([np.zeros(114), e0])
        T0, frac = 55, 0
        v = D.pred_lt_6(hist, T0, frac)
        gp_tab = D.QUA_GAIN_PITCH[gi]
        beta = min(gp_tab, 1.0)
        cs = code.copy()
        # T0 > 40: no in-subframe sharpening echo
        M = np.stack([v, cs], 1)
        sol, *_ = np.linalg.lstsq(M, e1, rcond=None)
        r = float(np.abs(e1 - M @ sol).max())
        ratio = sol[0] / gp_tab if gp_tab else float("nan")
        print(f"  {gi:2d}   {gp_tab:.6f}  {sol[0]:.6f}  {ratio:.6f} "
              f" {sol[1]:.3e}  {r:.1e}")


if __name__ == "__main__":
    main()
