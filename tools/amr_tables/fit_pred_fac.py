"""Re-fit the low-mode LSF MA predictor coefficients per-coefficient
from true-LSF extractions (diag_true_lsf machinery) across many random
streams, excluding reorder-masked (min-gap pushed) coefficients.

The earlier fit (fit_low_pred-era, median over rows) got coefficients
1,2,5,6,9 wrong because reorder push-up contaminated the medians; the
per-subframe true-LSF fits expose the raw law directly:
    lsf_q = mean + r_f + pred_fac * r_{f-1}   (table units)
with r = raw (pre-reorder) residual.

Usage: python fit_pred_fac.py [mode] [n_seeds]
Writes learned/pred_fac_fit.json.
"""

from __future__ import annotations

import copy
import json
import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np
from scipy.optimize import least_squares

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import amrnb_low as L  # noqa: E402
import replica  # noqa: E402
from diag_low_divergence import HPA, HPB  # noqa: E402
from diag_true_lsf import lsf_to_a  # noqa: E402
from oracle import decode_bits  # noqa: E402
from verify_low_decoder import FRAME_BITS  # noqa: E402

MIN_GAP = 50.0  # Hz, observed min-distance push in the true chain


def one_stream(args):
    mode, seed, n_frames = args
    rng = np.random.default_rng(seed)
    frames = [list(rng.integers(0, 2, FRAME_BITS[mode]))
              for _ in range(n_frames)]
    ref = decode_bits(L.MODE_IDX[mode], frames)
    ctr = dict(sf=0)
    true_rows = {}

    def hook(dec, k, info):
        sf = ctr["sf"]
        ctr["sf"] += 1
        seg = ref[40 * sf: 40 * sf + 40]
        gp, gc, v, code = info["gp"], info["gc"], info["v"], info["code"]

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
        if k == 3:  # w=1 subframe: pure new-frame LSF
            true_rows[sf // 4] = (lsf_fit, rms / max(segrms, 1e-12))
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

    # raw residual sequence under the raw-feedback law
    F = L.fields(mode)
    rs = []
    for f in range(n_frames):
        idx = [L.field_val(frames[f], F[(f"lsf{g}", -1)]) for g in range(3)]
        _, r = L.lsf_decode_3(mode, *idx, np.zeros(10))
        rs.append(r)

    samples = []
    for f in range(1, n_frames):
        if f not in true_rows or (f - 1) not in true_rows:
            continue
        lsf_true, rel = true_rows[f]
        if rel > 1e-4:
            continue  # untrusted fit
        gaps = np.diff(lsf_true)
        for i in range(10):
            # exclude min-gap-pushed coefficients (their raw value is
            # masked) and coefficients that push a neighbour
            if i > 0 and gaps[i - 1] < MIN_GAP + 1.0:
                continue
            samples.append(dict(coef=i, r_prev=float(rs[f - 1][i]),
                                r_cur=float(rs[f][i]),
                                true_tab=float(lsf_true[i] * L.SCALE),
                                seed=seed, frame=f))
    return samples


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "7k4"
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    jobs = [(mode, 3000 + i, 3) for i in range(n_seeds)]
    with ProcessPoolExecutor(max_workers=min(12, n_seeds)) as ex:
        all_samples = [s for out in ex.map(one_stream, jobs) for s in out]
    print(f"{len(all_samples)} usable (coef, frame) samples")
    fit = {}
    for i in range(10):
        rows = [s for s in all_samples if s["coef"] == i]
        if not rows:
            continue
        A = np.array([[s["r_prev"]] for s in rows])
        y = np.array([s["true_tab"] - L.MEAN_LSF_3[i] - s["r_cur"]
                      for s in rows])
        alpha, res, *_ = np.linalg.lstsq(A, y, rcond=None)
        pred = A[:, 0] * alpha[0]
        resid = np.abs(pred - y)
        q15 = alpha[0] * 32768.0
        fit[i] = dict(alpha=float(alpha[0]), q15=float(q15),
                      n=len(rows), max_resid_tab=float(resid.max()))
        print(f"coef {i}: alpha {alpha[0]:.5f} (Q15 {q15:8.1f}) "
              f"n={len(rows)} max_resid {resid.max():.2f} tab units "
              f"[ours {L.PRED_FAC[i]:.5f}]")
    json.dump(fit, open(os.path.join(HERE, "learned",
                                     "pred_fac_fit.json"), "w"))


if __name__ == "__main__":
    main()
