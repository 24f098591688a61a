"""ISF table refinement (v5): Gauss-Newton through the complete chain.

With the chain wavelet W pinned (fit_wavelet.py), the pi2 differential
response has a full forward model:

  h12k8(diff) ~= W (x) synth(code_diff; A16(isf_base + Delta)) * e^c

Refining Delta per index by damped GN on the time-domain residual
(coords of the field + a log-gain nuisance c) sharpens the AR-derived
tables from 30-150 Hz noise toward the fit floor (~0.06 rel residual
at the base, i.e. ~5-20 Hz per coordinate).  Initialized from the v4
tables; falls back to the init when GN cannot improve the residual.

Updates learned/isf_tables.npz in place (delta_<field>), banking the
per-index residuals as rel5_<field>.
"""

from __future__ import annotations

import os
import sys

import numpy as np

import wb
import isf_lab as L
import isf_param as IP
import scan_isf4 as S4

HERE = os.path.dirname(os.path.abspath(__file__))
WZ = np.load(os.path.join(HERE, "learned", "wavelet.npz"))
W = WZ["W"]
WOFF = int(WZ["OFF"])

FIELD_COORDS = {
    "f1a": list(range(0, 10)) + [15],
    "f1b": list(range(7, 16)),
    "f2a": list(range(0, 6)) + [15],
    "f2b": list(range(2, 8)) + [15],
    "f2c": list(range(5, 11)) + [15],
    "f2d": list(range(8, 14)) + [15],
    "f2e": list(range(10, 16)),
}


def synth_model(isf, p):
    a16 = IP.isf_to_a(isf)
    code = np.zeros(256)
    code[4 * p] += 2.0
    code[0] += 2.0
    s = np.zeros(250 + len(W))
    for n in range(len(s)):
        v = code[n] if n < 256 else 0.0
        for k in range(1, 17):
            if n - k >= 0:
                v -= a16[k] * s[n - k]
        s[n] = v
    out = np.zeros(250)
    for n in range(250):
        acc = 0.0
        lo = n + WOFF
        for j in range(len(W)):
            idx = lo - j
            if 0 <= idx < len(s):
                acc += W[j] * s[idx]
        out[n] = acc
    return out


def measure(assign, p):
    d = S4.diff_response(assign, p)
    return L.resample_to_128(d, 250)


def refine(field, idx, base16, init_delta, h_meas, p, iters=10):
    coords = FIELD_COORDS[field]
    n = len(coords)
    x = np.zeros(n + 1)
    x[:n] = init_delta[coords]
    nr = np.linalg.norm(h_meas)

    def model(xv):
        isf = base16.copy()
        isf[coords] += xv[:n]
        return synth_model(isf, p) * np.exp(xv[n])

    def cost(xv):
        m = model(xv)
        if not np.isfinite(m).all():
            return 9e9
        return float(np.linalg.norm(m - h_meas) / nr)

    best_c, best_x = cost(x), x.copy()
    for _ in range(iters):
        m0 = model(x)
        r = m0 - h_meas
        J = np.zeros((250, n + 1))
        for j in range(n + 1):
            dd = x.copy()
            h_ = 0.5 if j < n else 0.01
            dd[j] += h_
            J[:, j] = (model(dd) - m0) / h_
        if not np.isfinite(J).all():
            break
        try:
            st, _, _, _ = np.linalg.lstsq(J, -r, rcond=None)
        except np.linalg.LinAlgError:
            break
        st[:n] = np.clip(st[:n], -120, 120)
        ok = False
        sc = 1.0
        for _bt in range(6):
            xt = x + sc * st
            c = cost(xt)
            if c < best_c:
                ok = True
                break
            sc *= 0.5
        if not ok:
            break
        x, best_c, best_x = xt, c, xt.copy()
        if np.abs(sc * st).max() < 0.05:
            break
    out = init_delta.copy()
    out[coords] = best_x[:len(coords)]
    return out, best_c


def main():
    fields = sys.argv[1:] or list(L.FIELDS)
    path = os.path.join(HERE, "learned", "isf_tables.npz")
    z = dict(np.load(path))
    base16 = z["base16"]
    p = 0
    for f in fields:
        tab = z[f"delta_{f}"]
        rels = np.zeros(tab.shape[0])
        for idx in range(1, tab.shape[0]):
            h = measure({f: idx}, p)
            newd, rel = refine(f, idx, base16, tab[idx].copy(), h, p)
            tab[idx] = newd
            rels[idx] = rel
            if idx % 64 == 0:
                print(f"{f} {idx}/{tab.shape[0]} rel={rel:.4f}", flush=True)
        z[f"delta_{f}"] = tab
        z[f"rel5_{f}"] = rels
        print(f"field {f}: refine rel median {np.median(rels[1:]):.4f} "
              f"p90 {np.percentile(rels[1:], 90):.4f}", flush=True)
        np.savez(path, **z)
    print("saved", path)


if __name__ == "__main__":
    main()
