"""Recover the MR122 phase-dispersion (anti-sparseness) impulse response
and the frame-2 LP/gain parameters jointly.

Observation (extract_exc on 2-frame all-zero probes): frame-2 excitation
is NOT the sparse pulse comb — each subframe's excitation is the comb
convolved with a dense oscillating kernel, while frame 1 stays sparse.
That matches a decoder-side adaptive phase dispersion of the fixed
codevector whose state activates after the first frame in this
all-zero (unvoiced, gp=0) regime:

    exc(n) = gc * (comb (*) imp)(n)    [circular over the 40 subframe
                                        samples — to be validated]

Probes: the 2-frame all-zero stream plus frame-2 sign-bit flips
({96,100,108,112,116} + subframe partners) — same LP/gains, different
known combs. Alternating fit: per-subframe (a[10], gc) by nonlinear LS
given imp; imp[40] (per subframe, compared afterwards) by LS given
(a, gc). Convergence to float32 round-off validates the structure.
"""

from __future__ import annotations

import os
import sys

import numpy as np
from scipy.optimize import least_squares

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import replica  # noqa: E402
from fit_frame import CHAIN, HPG, HPP  # noqa: E402
import probe_frame2 as P  # noqa: E402
import refit_bad as RB  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
SIGN_BITS_SF = [[96 + k, 100 + k, 108 + k, 112 + k, 116 + k]
                for k in range(4)]


def circ_comb(signs, circular=True):
    """40-sample comb: pulses of +-1 at positions 0..4 -> matrix M with
    (M @ imp)(n) = sum_j signs[j] * imp((n - j) % 40) (or truncated when
    not circular). Column k of M is the response to a unit imp[k]."""
    M = np.zeros((40, 40))
    for j, s in enumerate(signs):
        for k in range(40):
            n = k + j
            if circular:
                M[n % 40, k] += s
            elif n < 40:
                M[n, k] += s
    return M


def advance_frame1(signs_f1=None):
    """Run the replica through an all-zero-LSF frame 1 (optionally with
    sign flips) and return (state, hp, frame-2 subframe a warm starts)."""
    q1, q2 = P.lsf_sets_for((0,) * 5)
    l1 = RB.hz_to_cos(RB.reorder_lsf(q1))
    l2 = RB.hz_to_cos(RB.reorder_lsf(q2))
    lsps = [P._ctx["half_init"] + 0.5 * l1, l1, 0.5 * l1 + 0.5 * l2, l2]
    gcs = P._ctx["gc_base"]
    st = replica.fresh_state()
    hp = [0.0] * 4
    for k in range(4):
        a = RB.lsp_to_a(np.sort(lsps[k])[::-1])
        exc = np.zeros(40)
        s = np.ones(5) if signs_f1 is None else signs_f1[k]
        exc[:5] = 2.0 * gcs[k] * s
        y = replica.subframe_chain(exc, a, st, **CHAIN)
        _, hp = replica.hp_biquad(
            y, np.array([1.0, -2.0, 1.0]) * HPG, np.asarray(HPP), hp)
    return st, hp, RB.lsp_to_a(np.sort(lsps[3])[::-1])


def clone(st):
    return {k: (v.copy() if hasattr(v, "copy") else v) for k, v in st.items()}


def run_sf(a, exc, st, hp):
    y = replica.subframe_chain(exc, a, st, **CHAIN)
    out, hp = replica.hp_biquad(
        y, np.array([1.0, -2.0, 1.0]) * HPG, np.asarray(HPP), hp)
    return out, hp


def main(circular=True):
    P._init()
    from oracle import decode_bits

    Z = [0] * P._ctx["NB"]
    # probes: frame2 = all-zero + each single sign bit per subframe
    sign_sets = [None] + [(k, j) for k in range(4) for j in range(5)]
    probes, combs = [], []
    for ss in sign_sets[:11]:  # all-zero + sf0..1 flips (keep cost down)
        b2 = list(Z)
        signs = np.ones((4, 5))
        if ss is not None:
            k, j = ss
            b2[SIGN_BITS_SF[k][j]] = 1
            signs[k, j] = -1.0
        pcm = decode_bits(7, [Z, b2]).astype(np.float64)
        probes.append((pcm[160:320], signs))
        combs.append([circ_comb(signs[k], circular) for k in range(4)])

    st0, hp0, a_warm = advance_frame1()
    # unknowns: a[4][10], gc[4], imp[4][40]
    a_cur = np.stack([a_warm] * 4)
    gc_cur = P._ctx["gc_base"].copy()
    imp_cur = np.zeros((4, 40))
    imp_cur[:, 0] = 1.0
    scale = max(np.abs(p[0]).max() for p in probes)

    def forward(a, gc, imp, upto_sf=4):
        """Model outputs for every probe; returns list of 160-sample
        arrays (and final states, unused)."""
        outs = []
        for (pcm, signs), Ms in zip(probes, combs):
            st, hp = clone(st0), list(hp0)
            o = np.empty(160)
            for k in range(4):
                exc = gc[k] * (Ms[k] @ imp[k])
                y, hp = run_sf(a[k], exc, st, hp)
                o[40 * k:40 * (k + 1)] = y
            outs.append(o)
        return outs

    def resid_all(a, gc, imp):
        outs = forward(a, gc, imp)
        return np.concatenate(
            [(o - pcm) / scale for o, (pcm, _) in zip(outs, probes)])

    for it in range(8):
        # (1) imp step: per subframe k, fix a/gc, fit imp[k] (linear-ish)
        for k in range(4):
            def r_imp(v):
                imp = imp_cur.copy()
                imp[k] = v
                return resid_all(a_cur, gc_cur, imp)
            res = least_squares(r_imp, imp_cur[k], xtol=1e-15, ftol=1e-15,
                                max_nfev=6)
            imp_cur[k] = res.x
        # (2) (a, gc) step per subframe
        for k in range(4):
            def r_ag(v):
                a = a_cur.copy()
                gc = gc_cur.copy()
                a[k] = v[:10]
                gc[k] = v[10]
                return resid_all(a, gc, imp_cur)
            res = least_squares(r_ag, np.concatenate([a_cur[k],
                                                      [gc_cur[k]]]),
                                xtol=1e-15, ftol=1e-15, max_nfev=8)
            a_cur[k] = res.x[:10]
            gc_cur[k] = res.x[10]
        r = np.abs(resid_all(a_cur, gc_cur, imp_cur)).max()
        print(f"iter {it}: max resid {r:.3e}", flush=True)
        if r < 3e-5:
            break
    np.savez(os.path.join(HERE, "learned", "dispersion_fit.npz"),
             a=a_cur, gc=gc_cur, imp=imp_cur, resid=r,
             circular=circular)
    print("imp[0] head:", np.array2string(imp_cur[0][:12], precision=4))
    print("imp[1] head:", np.array2string(imp_cur[1][:12], precision=4))
    print("imp[3] head:", np.array2string(imp_cur[3][:12], precision=4))
    print("gc:", gc_cur)
    print("saved learned/dispersion_fit.npz")


if __name__ == "__main__":
    main(circular=("--linear" not in sys.argv))
