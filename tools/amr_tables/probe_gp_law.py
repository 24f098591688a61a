"""Map the oracle's EFFECTIVE pitch gain vs the gain-VQ table value.

Setup (mode 7k4 by default): frame 1 builds a strong adaptive history
with known laws; frame 2 sf0 uses an absolute integer lag of exactly 40
(v = verbatim copy of the last committed subframe's history) and sweeps
all 128 gain rows. The lock-step machinery (diag_core) recovers the
true excitation, so g1 = effective pitch gain, g2 = effective code
gain, per row. A second sweep varies the FRAME-1 gain row to expose
history-dependent smoothing.

Usage: python probe_gp_law.py [mode]
"""

from __future__ import annotations

import json
import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import amrnb_low as L  # noqa: E402
from diag_core import run_stream  # noqa: E402
from modes_lab import make_frame  # noqa: E402


def lag_abs_int(T0):
    """Absolute-lag index giving integer delay T0 (frac = 0)."""
    if T0 >= 85:
        return 112 + T0
    idx = 3 * (T0 - 19) - 1
    t, f = L.dec_lag3_abs(idx)
    assert (t, f) == (T0, 0), (T0, t, f)
    return idx


def lag_rel_for(T0, T0_prev, nbits):
    """Index giving integer T0 under the pinned relative law."""
    for idx in range(1 << nbits):
        t, f = L.dec_lag3_rel(idx, T0_prev, nbits)
        if t == T0 and f == 0:
            return idx
    raise ValueError((T0, T0_prev, nbits))


def build_frames(mode, g2row, g1row, pulse_pos=33, lag=40):
    """Frame 1 gain row g1row everywhere; frame 2 sf0 gain row g2row."""
    F = L.fields(mode)
    nb_lag = {sf: len(F[("p_lag", sf)]) for sf in range(4)}
    vals1, vals2 = {}, {}
    T0p = None
    for sf in range(4):
        if nb_lag[sf] == 8:
            vals1[("p_lag", sf)] = lag_abs_int(lag)
        else:
            vals1[("p_lag", sf)] = lag_rel_for(lag, T0p, nb_lag[sf])
        T0p = lag
        vals1[("p_gain", sf)] = g1row
        vals1[("pulse0", sf)] = pulse_pos
        vals1[("pulse1", sf)] = 0
    vals2[("p_lag", 0)] = lag_abs_int(lag)
    vals2[("p_gain", 0)] = g2row
    vals2[("pulse0", 0)] = pulse_pos
    vals2[("pulse1", 0)] = 0
    # rest of frame 2: fixed benign fields
    for sf in range(1, 4):
        vals2[("p_lag", sf)] = (lag_rel_for(lag, lag, nb_lag[sf])
                                if nb_lag[sf] != 8 else lag_abs_int(lag))
        vals2[("p_gain", sf)] = g1row
        vals2[("pulse0", sf)] = pulse_pos
        vals2[("pulse1", sf)] = 0
    return [make_frame(mode, vals1), make_frame(mode, vals2)]


def one(args):
    mode, g2row, g1row = args
    rows = run_stream(mode, build_frames(mode, g2row, g1row))
    r = rows[4]  # frame 2 sf0
    return dict(row=g2row, hist_row=g1row, g1=r["g1"], g2=r["g2"],
                gp=r["gp"], gc=r["gc"], rel2=r["rel2"])


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "7k4"
    hist_rows = [0, 40, 100, 127]
    jobs = [(mode, g2, h) for h in hist_rows for g2 in range(0, 128, 2)]
    with ProcessPoolExecutor(max_workers=14) as ex:
        out = list(ex.map(one, jobs))
    json.dump(out, open(os.path.join(
        HERE, "learned", f"gp_law_{mode}.json"), "w"))
    print(f"saved {len(out)} measurements")
    for h in hist_rows:
        sub = [r for r in out if r["hist_row"] == h]
        ratio = np.array([r["g1"] / r["gp"] for r in sub])
        gps = np.array([r["gp"] for r in sub])
        rel2 = np.array([r["rel2"] for r in sub])
        print(f"hist_row={h}: g1/gp_table min {ratio.min():.3f} "
              f"med {np.median(ratio):.3f} max {ratio.max():.3f}; "
              f"rel2 max {rel2.max():.4f}")
        # print the relationship for a few sorted gp values
        o = np.argsort(gps)
        for i in o[::16]:
            print(f"   gp_tab {gps[i]:.4f} -> g1 {sub[i]['g1']:.4f} "
                  f"(x{ratio[i]:.3f})  g2/gc {sub[i]['g2'] / sub[i]['gc']:.3f}")


if __name__ == "__main__":
    main()
