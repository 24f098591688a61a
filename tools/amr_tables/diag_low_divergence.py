"""Attribute the low-mode replica's divergence: per subframe, fit the
oracle's TRUE synthesis excitation through the (known, state-synced)
postfilter chain, then decompose the misprediction
exc_true - exc_pred onto interpretable directions (adaptive vector v,
code, dispersed code variants).

Committing exc_true keeps the chain state synced to the oracle even
where our excitation model is wrong, so errors don't compound and the
attribution stays per-subframe.

Usage: python diag_low_divergence.py [mode] [seed] [n_frames]
"""

from __future__ import annotations

import copy
import os
import sys

import numpy as np
from scipy.optimize import least_squares

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import amrnb_low as L  # noqa: E402
import replica  # noqa: E402
from fit_frame import HPG, HPP  # noqa: E402
from oracle import decode_bits  # noqa: E402
from verify_low_decoder import FRAME_BITS  # noqa: E402

HPB = np.array([1.0, -2.0, 1.0]) * HPG
HPA = np.asarray(HPP)


def chain_out(exc, a, st, hp):
    st = copy.deepcopy(st)
    hp = list(hp)
    y = replica.subframe_chain(np.asarray(exc), a, st, **L.LOW_CHAIN)
    o, hp = replica.hp_biquad(y, HPB, HPA, hp)
    return o, st, hp


def fit_exc(seg, a, st, hp, exc0):
    def resid(e):
        return chain_out(e, a, st, hp)[0] - seg

    r = least_squares(resid, exc0, method="lm", xtol=1e-14, ftol=1e-14)
    return r.x, float(np.sqrt(np.mean(r.fun ** 2)))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "7k4"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    rng = np.random.default_rng(seed)
    frames = [list(rng.integers(0, 2, FRAME_BITS[mode]))
              for _ in range(n_frames)]
    ref = decode_bits(L.MODE_IDX[mode], frames)
    ctr = dict(sf=0)
    rows = []

    def hook(dec, k, info):
        sf = ctr["sf"]
        ctr["sf"] += 1
        seg = ref[40 * sf: 40 * sf + 40]
        gp, gc, v, code = info["gp"], info["gc"], info["v"], info["code"]
        exc_pred = info["exc"]
        if gp > 0.5:
            e0 = float(np.dot(exc_pred, exc_pred))
            pf = 0.5 * gp * min(gp, L.SHARP_MAX)
            e2 = exc_pred + pf * v
            s2 = float(np.dot(e2, e2))
            if s2 > 0:
                exc_pred = e2 * np.sqrt(e0 / s2)
        exc_true, rms = fit_exc(seg, info["a"], dec.st_chain, dec.hp,
                                exc_pred)
        d = exc_true - exc_pred
        nd = np.linalg.norm(d)
        ne = np.linalg.norm(exc_true)
        # project the error onto candidate directions
        basis = {"v": v, "code": code}
        for r_ in range(3):
            basis[f"disp{r_}"] = L.disp_circular(code, r_) - code
        proj = {}
        for nmame, b in basis.items():
            nb = np.linalg.norm(b)
            proj[nmame] = (float(np.dot(d, b) / (nd * nb))
                           if nd > 0 and nb > 0 else 0.0)
        rows.append(dict(sf=sf, rel=nd / max(ne, 1e-12), fit_rms=rms,
                         gp=gp, gc=gc, **proj))
        return exc_true  # keep the chain synced

    dec = L.LowDecoder(mode, disp_hook=hook)
    for b in frames:
        dec.decode_frame(b)
    print(f"{mode} seed={seed}: per-subframe exc misprediction")
    print("sf   rel_err fit_rms    gp      cos(v) cos(code) "
          "cos(d0) cos(d1) cos(d2)")
    for r in rows:
        print(f"{r['sf']:3d} {r['rel']:8.4f} {r['fit_rms']:.1e} "
              f"{r['gp']:7.3f} {r['v']:7.3f} {r['code']:8.3f} "
              f"{r['disp0']:7.3f} {r['disp1']:7.3f} {r['disp2']:7.3f}")


if __name__ == "__main__":
    main()
