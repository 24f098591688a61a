"""Build the MR122 LSF quantizer model from the full behavioral sweep
(/tmp/lsf_sweep.npz, produced by sweep_lsf.py).

Frame-1 facts (predictor memory zero): fitted subframe-2 LSFs equal
mean + r[q1 cols] and subframe-4 LSFs mean + r[q2 cols] of the selected
row of each split-matrix group, so the sweep measures the ABSOLUTE
quantizer output (mean + residual row) for every index of every group,
which is exactly what a replica decoder needs for frame 1. Subframes
1 and 3 are interpolated; this script fits the interpolation weights and
the decoder's initial LSP memory in both the LSF (frequency) and LSP
(cosine) domains and reports which domain the oracle uses.

Outputs learned/lsf_mr122.npz:
  q1_hz[g][v][2], q2_hz[g][v][2]  absolute frame-1 LSF pairs per group row
  interp: domain, weights for subframe 0 and 2, initial memory vector
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sweep_lsf import GROUPS  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
PAIRS = [(0, 1), (2, 3), (4, 5), (6, 7), (8, 9)]
SF_INT1, SF_Q1, SF_INT2, SF_Q2 = 0, 1, 2, 3


def load_sweep(path="/tmp/lsf_sweep.npz"):
    z = np.load(path)
    lsf = [z[f"lsf{g}"] for g in range(5)]
    res = [z[f"res{g}"] for g in range(5)]
    gc = [z[f"gc{g}"] for g in range(5)]
    return lsf, res, gc


def build_tables(lsf, res, tol=1e-4):
    """Per group: absolute (mean + residual) LSF pairs for q1 and q2."""
    q1 = [np.full((len(l), 2), np.nan) for l in lsf]
    q2 = [np.full((len(l), 2), np.nan) for l in lsf]
    bad = []
    for g in range(5):
        c0, c1 = PAIRS[g]
        for v in range(len(lsf[g])):
            if res[g][v] > tol or not np.isfinite(
                    lsf[g][v][[SF_Q1, SF_Q2]][:, [c0, c1]]).all():
                bad.append((g, v, float(res[g][v])))
                continue
            q1[g][v] = lsf[g][v, SF_Q1, [c0, c1]]
            q2[g][v] = lsf[g][v, SF_Q2, [c0, c1]]
    return q1, q2, bad


def fit_interpolation(lsf, res, tol=1e-4):
    """Fit lsp_sf = w_prev * lsp_init + w_q1 * lsp(q1) + w_q2 * lsp(q2)
    for subframes 0 and 2, in LSF-Hz and LSP-cos domains, over all good
    probes. The initial memory enters only subframe 0 (and possibly 2);
    solve jointly for (weights, init vector) by alternating LS —
    the model is bilinear but w's are scalars so a small alternation
    converges immediately."""
    out = {}
    for domain in ("hz", "cos"):
        conv = ((lambda f: f) if domain == "hz"
                else (lambda f: np.cos(2 * np.pi * f / 8000.0)))
        rows_sf0, rows_sf2 = [], []
        for g in range(5):
            for v in range(len(lsf[g])):
                if res[g][v] > tol or not np.isfinite(lsf[g][v]).all():
                    continue
                L = conv(lsf[g][v])
                rows_sf0.append((L[SF_INT1], L[SF_Q1], L[SF_Q2]))
                rows_sf2.append((L[SF_INT2], L[SF_Q1], L[SF_Q2]))
        for name, rows in (("sf0", rows_sf0), ("sf2", rows_sf2)):
            y = np.stack([r[0] for r in rows])       # (P, 10)
            x1 = np.stack([r[1] for r in rows])
            x2 = np.stack([r[2] for r in rows])
            # alternate: given weights solve init; given init solve weights
            w = np.array([0.5, 0.25, 0.25])
            init = np.zeros(10)
            for _ in range(50):
                if abs(w[0]) > 1e-12:
                    init = (y - w[1] * x1 - w[2] * x2).mean(0) / w[0]
                A = np.stack([np.broadcast_to(init, y.shape).ravel(),
                              x1.ravel(), x2.ravel()], 1)
                w, *_ = np.linalg.lstsq(A, y.ravel(), rcond=None)
            pred = w[0] * init[None] + w[1] * x1 + w[2] * x2
            rms = float(np.sqrt(np.mean((pred - y) ** 2)))
            out[(domain, name)] = dict(w=w, init=init, rms=rms,
                                       n=len(rows))
    return out


def main():
    lsf, res, gc = load_sweep()
    q1, q2, bad = build_tables(lsf, res)
    print(f"bad fits: {len(bad)}")
    for g, v, r in bad[:20]:
        print(f"  g{g} v{v} resid {r:.1e}")
    for g in range(5):
        n = len(q1[g])
        good = np.isfinite(q1[g][:, 0]).sum()
        print(f"group {g}: {good}/{n} rows, q1 col ranges "
              f"[{np.nanmin(q1[g], 0)}, {np.nanmax(q1[g], 0)}]")
    fits = fit_interpolation(lsf, res)
    for k, f in sorted(fits.items()):
        print(f"{k}: w={np.round(f['w'], 6)} rms={f['rms']:.2e} "
              f"(n={f['n']})")
        if k[1] == "sf0":
            print(f"   init={np.round(f['init'], 4)}")
    best = {}
    for name in ("sf0", "sf2"):
        dom = min(("hz", "cos"), key=lambda d: fits[(d, name)]["rms"])
        best[name] = (dom, fits[(dom, name)])
        print(f"{name}: best domain = {dom}")
    np.savez(os.path.join(HERE, "learned", "lsf_mr122.npz"),
             **{f"q1_{g}": q1[g] for g in range(5)},
             **{f"q2_{g}": q2[g] for g in range(5)},
             sf0_domain=best["sf0"][0], sf0_w=best["sf0"][1]["w"],
             sf0_init=best["sf0"][1]["init"],
             sf2_domain=best["sf2"][0], sf2_w=best["sf2"][1]["w"],
             sf2_init=best["sf2"][1]["init"])
    print("saved", os.path.join(HERE, "learned", "lsf_mr122.npz"))


if __name__ == "__main__":
    main()
