"""Fit the oracle's TRUE subframe LSFs directly: at every subframe,
jointly fit (g1, g2, lsf[10] in Hz) so that
chain(g1*v + g2*code [+emphasis], a(lsf)) matches the oracle segment.
The chain state is advanced with the fitted (true) a and structured
excitation, so every subframe measurement is independent and the
recovered LSFs track the oracle's actual interpolation chain.

Dumps per-subframe true LSFs to learned/true_lsf_<mode>_<seed>.json
and prints them against the replica's interpolated LSFs.

Usage: python diag_true_lsf.py [mode] [seed] [n_frames]
"""

from __future__ import annotations

import copy
import json
import os
import sys

import numpy as np
from scipy.optimize import least_squares

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import amrnb_low as L  # noqa: E402
import replica  # noqa: E402
from diag_low_divergence import HPA, HPB  # noqa: E402
from oracle import decode_bits  # noqa: E402
from refit_bad import hz_to_cos, lsp_to_a  # noqa: E402
from verify_low_decoder import FRAME_BITS  # noqa: E402


def lsf_to_a(lsf_hz):
    lsp = hz_to_cos(np.asarray(lsf_hz))
    return lsp_to_a(np.sort(lsp)[::-1])


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "7k4"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    rng = np.random.default_rng(seed)
    frames = [list(rng.integers(0, 2, FRAME_BITS[mode]))
              for _ in range(n_frames)]
    ref = decode_bits(L.MODE_IDX[mode], frames)
    ctr = dict(sf=0)
    out_rows = []

    def hook(dec, k, info):
        sf = ctr["sf"]
        ctr["sf"] += 1
        seg = ref[40 * sf: 40 * sf + 40]
        gp, gc, v, code = info["gp"], info["gc"], info["v"], info["code"]
        # our replica's interpolated LSF for this subframe (from a via
        # the decoder's own lsp chain) — recompute for the report
        def model(p):
            g1, g2 = p[0], p[1]
            a = lsf_to_a(p[2:])
            exc = g1 * v + g2 * code
            if gp > 0.5:
                e0 = float(np.dot(exc, exc))
                pf = 0.5 * gp * min(gp, L.SHARP_MAX)
                e2 = exc + pf * v
                s2 = float(np.dot(e2, e2))
                exc = e2 * np.sqrt(e0 / s2) if s2 > 0 else exc
            st = copy.deepcopy(dec.st_chain)
            hp = list(dec.hp)
            y = replica.subframe_chain(exc, a, st, **L.LOW_CHAIN)
            o, _ = replica.hp_biquad(y, HPB, HPA, hp)
            return o - seg

        lsf0 = np.sort(np.arccos(np.clip(dec._lsp_now, -1, 1))
                       / (2 * np.pi) * 8000.0)
        p0 = np.concatenate([[gp, gc], lsf0])
        r = least_squares(model, p0, method="lm", xtol=1e-15, ftol=1e-15)
        rms = float(np.sqrt(np.mean(r.fun ** 2)))
        segrms = float(np.sqrt(np.mean(seg ** 2)))
        lsf_fit = np.sort(r.x[2:])
        out_rows.append(dict(sf=sf, rel=rms / max(segrms, 1e-12),
                             g1=r.x[0], g2=r.x[1], gp=gp, gc=gc,
                             lsf_true=lsf_fit.tolist(),
                             lsf_ours=lsf0.tolist()))
        print(f"sf{sf:3d} rel {rms / max(segrms, 1e-12):8.1e} "
              f"dLSF {np.round(lsf_fit - lsf0, 1)}")
        exc = r.x[0] * v + r.x[1] * code
        dec.exc_hist[-40:] = np.trunc(exc * 16384.0) / 16384.0
        exc_syn = exc
        if gp > 0.5:
            e0 = float(np.dot(exc, exc))
            pf = 0.5 * gp * min(gp, L.SHARP_MAX)
            e2 = exc + pf * v
            s2 = float(np.dot(e2, e2))
            if s2 > 0:
                exc_syn = e2 * np.sqrt(e0 / s2)
        return dict(exc_syn=exc_syn, a=lsf_to_a(lsf_fit))

    dec = L.LowDecoder(mode, disp_hook=hook)
    for b in frames:
        dec.decode_frame(b)
    path = os.path.join(HERE, "learned", f"true_lsf_{mode}_{seed}.json")
    json.dump(out_rows, open(path, "w"))
    print("saved", path)


if __name__ == "__main__":
    main()
