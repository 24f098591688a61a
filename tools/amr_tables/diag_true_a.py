"""Third-stage divergence attribution: at every subframe, jointly fit
(a[10], g1, g2) so that chain(g1*v + g2*code [+ emphasis], a) matches
the oracle segment. If the structured fit succeeds (rms ~0) where the
2-gain fit with OUR a fails, the frame-2+ divergence lives in the LSF
-> LSP -> a chain, and the fitted a IS the oracle's true a.

Prints, per subframe: rms of the structured fit, fitted gains vs
decoded, and the LSF-domain delta between our a and the fitted a
(via polynomial root angles).

Usage: python diag_true_a.py [mode] [seed] [n_frames]
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
from diag_low_divergence import HPA, HPB, fit_exc  # noqa: E402
from diag_low_gains2 import invert_emphasis  # noqa: E402
from oracle import decode_bits  # noqa: E402
from verify_low_decoder import FRAME_BITS  # noqa: E402


def a_to_lsf_hz(a):
    """LP coefficients -> LSF in Hz via the symmetric/antisymmetric
    polynomial root angles (numpy roots; diagnostic only)."""
    p = np.concatenate([[1.0], a])          # A(z), len 11
    f1 = p + p[::-1]                        # P(z) = A(z) + z^-11 A(z^-1)
    f2 = p - p[::-1]
    # deflate known roots z=-1 of f1 and z=+1 of f2
    f1 = np.polydiv(f1, [1.0, 1.0])[0]
    f2 = np.polydiv(f2, [1.0, -1.0])[0]
    ang = []
    for f in (f1, f2):
        r = np.roots(f)
        w = np.angle(r[np.imag(r) >= 0])
        ang.extend(w.tolist())
    ang = np.sort(np.abs(np.asarray(ang)))
    return ang / (2.0 * np.pi) * 8000.0


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "7k4"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    rng = np.random.default_rng(seed)
    frames = [list(rng.integers(0, 2, FRAME_BITS[mode]))
              for _ in range(n_frames)]
    ref = decode_bits(L.MODE_IDX[mode], frames)
    ctr = dict(sf=0)
    LSF_ROWS = []

    def hook(dec, k, info):
        sf = ctr["sf"]
        ctr["sf"] += 1
        seg = ref[40 * sf: 40 * sf + 40]
        gp, gc, v, code = info["gp"], info["gc"], info["v"], info["code"]
        a0 = info["a"]

        def model(p):
            g1, g2 = p[0], p[1]
            a = p[2:]
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

        p0 = np.concatenate([[gp, gc], a0])
        r = least_squares(model, p0, method="lm", xtol=1e-15, ftol=1e-15)
        rms = float(np.sqrt(np.mean(r.fun ** 2)))
        segrms = float(np.sqrt(np.mean(seg ** 2)))
        g1, g2 = r.x[0], r.x[1]
        a_fit = r.x[2:]
        lsf_fit = lsf_ours = None
        try:
            lsf_ours = a_to_lsf_hz(a0)
            lsf_fit = a_to_lsf_hz(a_fit)
            dl = np.round(lsf_fit - lsf_ours, 1)
        except Exception:
            dl = None
        print(f"sf{sf:3d} fit_rms/seg {rms / max(segrms, 1e-12):8.1e} "
              f"g1 {g1:7.4f}/{gp:7.4f} g2 {g2:8.5f}/{gc:8.5f} "
              f"dLSF(Hz) {dl}")
        if lsf_fit is not None:
            LSF_ROWS.append((sf, lsf_fit, lsf_ours))
        # commit truth (fitted a + structured excitation) to the chain
        # and the history so chain state tracks the ORACLE's, not ours
        exc = g1 * v + g2 * code
        dec.exc_hist[-40:] = np.trunc(exc * 16384.0) / 16384.0
        exc_syn = exc
        if gp > 0.5:
            e0 = float(np.dot(exc, exc))
            pf = 0.5 * gp * min(gp, L.SHARP_MAX)
            e2 = exc + pf * v
            s2 = float(np.dot(e2, e2))
            if s2 > 0:
                exc_syn = e2 * np.sqrt(e0 / s2)
        return dict(exc_syn=exc_syn, a=a_fit)

    dec = L.LowDecoder(mode, disp_hook=hook)
    for b in frames:
        dec.decode_frame(b)

    # Per frame, recover the oracle's true (old, new) interpolation
    # endpoints in the cos domain from the 4 subframe measurements:
    # lsp_k = (1-w_k)*old + w_k*new, w_k = (k+1)/4.
    for f in range(n_frames):
        rows = [r for r in LSF_ROWS if r[0] // 4 == f]
        if len(rows) < 2:
            continue
        W = np.array([[1.0 - (r[0] % 4 + 1) / 4.0, (r[0] % 4 + 1) / 4.0]
                      for r in rows])
        Y = np.stack([np.cos(2 * np.pi * r[1] / 8000.0) for r in rows])
        sol, res, *_ = np.linalg.lstsq(W, Y, rcond=None)
        old_hz = np.arccos(np.clip(sol[0], -1, 1)) / (2 * np.pi) * 8000
        new_hz = np.arccos(np.clip(sol[1], -1, 1)) / (2 * np.pi) * 8000
        fit_dev = np.abs(W @ sol - Y).max()
        print(f"frame {f}: endpoint fit dev {fit_dev:.2e}")
        print(f"  true old (Hz): {np.round(old_hz, 1)}")
        print(f"  true new (Hz): {np.round(new_hz, 1)}")


if __name__ == "__main__":
    main()
