"""Pin the low-mode synthesis emphasis + effective pitch gain law.

Cleanest possible window: frame 1, subframe 1. sf0 has zero adaptive
history, so its excitation gc0*code0 is exactly known; sf1 reads it
verbatim via an integer lag of 40. Sweeping sf1's gain row and fitting
the oracle's true excitation as g1*v + g2*code then gives, per row:

  g2 = s * gc          ->  s   (assuming the pinned gc predictor law)
  g1 = s * (gp_u + pf) ->  gp_u + pf
  s^2 = E(gp_u v + gc c) / E((gp_u + pf) v + gc c)   (energy renorm)

Two equations in (gp_u, pf): solved per row; the scatter of pf vs gp_u
exposes the emphasis factor law, and gp_u vs the table value exposes
any pitch-gain transformation.

Usage: python probe_emph_law.py [mode]
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
from probe_gp_law import lag_abs_int, lag_rel_for  # noqa: E402


def build(mode, row1, row0=20, pulse0=33, pulse1=777):
    F = L.fields(mode)
    vals = {}
    vals[("p_lag", 0)] = lag_abs_int(40)
    vals[("p_gain", 0)] = row0
    vals[("pulse0", 0)] = pulse0
    vals[("pulse1", 0)] = 0
    nb1 = len(F[("p_lag", 1)])
    vals[("p_lag", 1)] = lag_rel_for(40, 40, nb1)
    vals[("p_gain", 1)] = row1
    vals[("pulse0", 1)] = pulse1 % (1 << len(F[("pulse0", 1)]))
    vals[("pulse1", 1)] = 0
    for sf in (2, 3):
        vals[("p_lag", sf)] = (lag_abs_int(40)
                               if len(F[("p_lag", sf)]) == 8
                               else lag_rel_for(40, 40,
                                                len(F[("p_lag", sf)])))
        vals[("p_gain", sf)] = 0
        vals[("pulse0", sf)] = 0
        vals[("pulse1", sf)] = 0
    return [make_frame(mode, vals)]


def one(args):
    mode, row1 = args
    rows = run_stream(mode, build(mode, row1), keep_exc=True)
    r = rows[1]
    v, code, et = r["v"], r["code"], r["exc_true"]
    gp, gc = r["gp"], r["gc"]
    g1, g2 = r["g1"], r["g2"]
    s = g2 / gc if gc else 0.0
    tot = g1 / s if s else 0.0  # gp_u + pf
    # energy constraint: s^2 = E(gp_u v + gc c) / E(tot v + gc c)
    vv = float(np.dot(v, v))
    vc = float(np.dot(v, code))
    cc = float(np.dot(code, code))

    def energy(g):
        return g * g * vv + 2 * g * gc * vc + gc * gc * cc

    e2 = energy(tot)
    target = s * s * e2
    # solve energy(gp_u) = target for gp_u (quadratic)
    a, b, c0 = vv, 2 * gc * vc, gc * gc * cc - target
    disc = b * b - 4 * a * c0
    gp_u = (-b + np.sqrt(disc)) / (2 * a) if disc >= 0 and a > 0 else \
        float("nan")
    return dict(row=row1, gp_tab=gp, gc_tab=gc, g1=g1, g2=g2,
                s=s, tot=tot, gp_u=float(gp_u),
                pf=float(tot - gp_u), rel2=r["rel2"])


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "7k4"
    n = len(L.GAINS_HIGH) if mode in ("6k7", "7k4", "10k2") else \
        len(L.GAINS_LOW)
    jobs = [(mode, r) for r in range(n)]
    with ProcessPoolExecutor(max_workers=14) as ex:
        out = list(ex.map(one, jobs))
    json.dump(out, open(os.path.join(
        HERE, "learned", f"emph_law_{mode}.json"), "w"))
    out.sort(key=lambda r: r["gp_tab"])
    print("  gp_tab    gp_u   gp_u/tab    pf    pf/gp_u    s     rel2")
    for r in out[::4] + out[-3:]:
        print(f"{r['gp_tab']:8.4f} {r['gp_u']:8.4f} "
              f"{r['gp_u'] / r['gp_tab'] if r['gp_tab'] else 0:8.4f} "
              f"{r['pf']:8.4f} "
              f"{r['pf'] / r['gp_u'] if r['gp_u'] else 0:8.4f} "
              f"{r['s']:7.4f} {r['rel2']:8.5f}")


if __name__ == "__main__":
    main()
