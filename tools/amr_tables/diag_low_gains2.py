"""Second-stage divergence attribution: per subframe, fit the oracle's
true excitation as g1*v + g2*code (known shapes, free gains) and
compare the fitted gains with the replica's decoded (gp, gc). Also
re-sync the adaptive history from the inverted true excitation so
errors never compound — every row is then an independent measurement.

Usage: python diag_low_gains2.py [mode] [seed] [n_frames]
"""

from __future__ import annotations

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import amrnb_low as L  # noqa: E402
from diag_low_divergence import fit_exc  # noqa: E402
from oracle import decode_bits  # noqa: E402
from verify_low_decoder import FRAME_BITS  # noqa: E402


def invert_emphasis(exc_syn, v, gp):
    """Invert exc_syn = s*(exc + pf*v), s = ||exc|| / ||exc + pf*v||,
    for exc. Uses the constraint ||exc|| = ||exc_syn||."""
    if gp <= 0.5:
        return exc_syn
    pf = 0.5 * gp * min(gp, L.SHARP_MAX)
    # exc = exc_syn/s - pf*v with ||exc|| = ||exc_syn||; solve for 1/s
    u2 = float(np.dot(exc_syn, exc_syn))
    uv = float(np.dot(exc_syn, v))
    v2 = float(np.dot(v, v))
    # ||t*u - pf*v||^2 = u2  ->  u2 t^2 - 2 pf uv t + pf^2 v2 - u2 = 0
    a, b, c = u2, -2 * pf * uv, pf * pf * v2 - u2
    disc = b * b - 4 * a * c
    if disc < 0 or a == 0:
        return exc_syn
    t = (-b + np.sqrt(disc)) / (2 * a)  # take the positive-scale root
    return t * exc_syn - pf * v


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
        # 2-param projection onto (v, code)
        A = np.stack([v, code], 1)
        sol, res, *_ = np.linalg.lstsq(A, exc_true, rcond=None)
        fitted = A @ sol
        rel2 = (np.linalg.norm(exc_true - fitted)
                / max(np.linalg.norm(exc_true), 1e-12))
        rows.append(dict(sf=sf, gp=gp, gc=gc, g1=float(sol[0]),
                         g2=float(sol[1]), rel2=float(rel2),
                         ecode=float(np.dot(code, code))))
        # re-sync feedback: invert emphasis, then truncation law
        exc_fb = invert_emphasis(exc_true, v, gp)
        fb = np.trunc(exc_fb * 16384.0) / 16384.0
        dec.exc_hist[-40:] = fb
        return exc_true

    dec = L.LowDecoder(mode, disp_hook=hook)
    for b in frames:
        dec.decode_frame(b)
    print(f"{mode} seed={seed}: free (g1,g2) vs decoded (gp,gc); "
          "rel2 = residual after the 2-shape fit")
    print("sf    gp_dec   g1_fit    gc_dec    g2_fit   rel2   g1/gp  "
          "g2/gc")
    for r in rows:
        print(f"{r['sf']:3d} {r['gp']:8.4f} {r['g1']:8.4f} "
              f"{r['gc']:9.5f} {r['g2']:9.5f} {r['rel2']:7.4f} "
              f"{r['g1'] / r['gp'] if r['gp'] else 0:6.3f} "
              f"{r['g2'] / r['gc'] if r['gc'] else 0:6.3f}")


if __name__ == "__main__":
    main()
