"""Shared lock-step measurement machinery for the low-mode campaign:
decode a stream with the oracle, run the replica alongside, and at
every subframe recover the oracle's TRUE synthesis excitation by
least-squares through the (state-synced) postfilter chain. The truth
is committed to both the chain state and the adaptive history, so
every subframe is an independent measurement.

Returns per-subframe rows: decoded context (gp, gc, T0, frac, shapes)
plus the free 2-parameter (g1, g2) fit onto span{v, code} and its
residual.
"""

from __future__ import annotations

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import amrnb_low as L  # noqa: E402
from diag_low_divergence import fit_exc  # noqa: E402
from diag_low_gains2 import invert_emphasis  # noqa: E402
from oracle import decode_bits  # noqa: E402


def run_stream(mode, frames, keep_exc=False):
    """frames: list of bit lists. Returns list of per-subframe dicts."""
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
        A = np.stack([v, code], 1)
        sol, *_ = np.linalg.lstsq(A, exc_true, rcond=None)
        rel2 = (np.linalg.norm(exc_true - A @ sol)
                / max(np.linalg.norm(exc_true), 1e-12))
        row = dict(sf=sf, gp=gp, gc=gc, g1=float(sol[0]),
                   g2=float(sol[1]), rel2=float(rel2), fit_rms=rms,
                   ecode=float(np.dot(code, code)))
        if keep_exc:
            row.update(v=v.copy(), code=code.copy(),
                       exc_true=exc_true.copy(), a=info["a"].copy())
        rows.append(row)
        exc_fb = invert_emphasis(exc_true, v, gp)
        dec.exc_hist[-40:] = np.trunc(exc_fb * 16384.0) / 16384.0
        return exc_true

    dec = L.LowDecoder(mode, disp_hook=hook)
    for b in frames:
        dec.decode_frame(b)
    return rows
