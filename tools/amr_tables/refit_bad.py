"""Refit the LSF-sweep probes whose unconstrained per-subframe chain fit
failed (build_lsf_tables reports ~6% bad rows), using the now-PINNED
frame structure: subframe LSPs are 0.5/0.5 cosine-domain interpolations
(sf0 of init+q1, sf2 of q1+q2), only ONE group's LSF pair moves per
probe, and gains are per-subframe scalars. A frame-1 probe therefore has
exactly 8 unknowns: (q1 pair, q2 pair, gc0..3) — fit jointly on all 160
samples with grid restarts over the group's measured value range.

Updates learned/lsf_mr122.npz in place (q1_g / q2_g rows)."""

from __future__ import annotations

import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np
from scipy.optimize import least_squares

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sweep_lsf import GROUPS  # noqa: E402
from build_lsf_tables import PAIRS, load_sweep, build_tables  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
LEARNED = os.path.join(HERE, "learned", "lsf_mr122.npz")


def lsp_to_a(lsp):
    """LSP cos-domain values (descending cos = ascending freq) -> LP
    coefficients a[0..9] with A(z) = 1 + sum a_i z^-(i+1). Standard
    P/Q reconstruction: P uses the even-indexed (0,2,..) LSPs, Q the
    odd-indexed, A = (P*(1+z^-1) + Q*(1-z^-1))/2."""
    def poly_from(qs):
        p = np.array([1.0])
        for q in qs:
            p = np.convolve(p, [1.0, -2.0 * q, 1.0])
        return p
    P = poly_from(lsp[0::2])          # degree 10
    Q = poly_from(lsp[1::2])
    P1 = np.convolve(P, [1.0, 1.0])   # * (1 + z^-1)
    Q1 = np.convolve(Q, [1.0, -1.0])  # * (1 - z^-1)
    A = 0.5 * (P1 + Q1)               # degree 11, last coeff cancels
    return A[1:11] / A[0]


# Decoder-side minimum LSF spacing (Hz), pinned by fitting the push-up
# distance on multiple violating rows independently (both converge to
# 50.049): each quantized LSF set is reordered lsf[i] = max(lsf[i],
# lsf[i-1] + DMIN) BEFORE interpolation. Rows violating the spacing are
# exactly the ~6% that the reorder-free model could not fit.
LSF_MIN_DIST_HZ = 50.049


def reorder_lsf(lsf, dmin=LSF_MIN_DIST_HZ):
    out = np.array(lsf, float)
    for i in range(1, len(out)):
        if out[i] < out[i - 1] + dmin:
            out[i] = out[i - 1] + dmin
    return out


def hz_to_cos(f):
    return np.cos(2.0 * np.pi * np.asarray(f) / 8000.0)


def cos_to_hz(c):
    return np.arccos(np.clip(c, -1.0, 1.0)) * 8000.0 / (2.0 * np.pi)


_ctx = {}


def _init():
    import replica
    from fit_frame import HPG, HPP, CHAIN
    from oracle import decode_bits, NB_BITS
    z = np.load(LEARNED)
    base_q1 = np.array([z[f"q1_{g}"][0] for g in range(5)]).ravel()  # Hz
    base_q2 = np.array([z[f"q2_{g}"][0] for g in range(5)]).ravel()
    # only the product w_init * init_lsp is identified by the sweep fit;
    # fold the fitted weight in so the interpolation weights are exactly
    # 0.5/0.5 (validated: frame rel err 3e-6 vs 1e-3 with the raw split)
    half_init = z["sf0_w"][0] * z["sf0_init"]
    _ctx.update(replica=replica, HPG=HPG, HPP=np.asarray(HPP), CHAIN=CHAIN,
                decode_bits=decode_bits, NB=NB_BITS[7],
                base_q1=base_q1, base_q2=base_q2, half_init=half_init)


def frame_model(q1_hz, q2_hz, gcs):
    """Decode chain output for frame 1 given the two LSF sets (Hz) and
    per-subframe gains, using the pinned 0.5/0.5 cosine interpolation."""
    r = _ctx["replica"]
    l1, l2 = hz_to_cos(reorder_lsf(q1_hz)), hz_to_cos(reorder_lsf(q2_hz))
    lsps = [_ctx["half_init"] + 0.5 * l1, l1, 0.5 * l1 + 0.5 * l2, l2]
    st = r.fresh_state()
    hp_mem = [0.0] * 4
    out = np.empty(160)
    for k in range(4):
        a = lsp_to_a(np.sort(lsps[k])[::-1])
        exc = np.zeros(40)
        exc[:5] = 2.0 * gcs[k]
        y = r.subframe_chain(exc, a, st, **_ctx["CHAIN"])
        o, hp_mem = r.hp_biquad(
            y, np.array([1.0, -2.0, 1.0]) * _ctx["HPG"], _ctx["HPP"], hp_mem)
        out[40 * k:40 * (k + 1)] = o
    return out


def refit_one(task):
    gi, v, gc_warm = task
    if not _ctx:
        _init()
    bits = [0] * _ctx["NB"]
    g = GROUPS[gi]
    for j, b in enumerate(g):
        if (v >> (len(g) - 1 - j)) & 1:
            bits[b] = 1
    pcm = _ctx["decode_bits"](7, [bits])[:160].astype(np.float64)
    scale = np.abs(pcm).max()
    if scale == 0:
        return gi, v, None, None, np.inf
    c0, c1 = PAIRS[gi]
    bq1, bq2 = _ctx["base_q1"], _ctx["base_q2"]

    def resid(p):
        q1, q2 = bq1.copy(), bq2.copy()
        q1[[c0, c1]] = p[0:2]
        q2[[c0, c1]] = p[2:4]
        return (frame_model(q1, q2, p[4:8]) - pcm) / scale

    # grid restarts over the group's plausible range
    lo = min(bq1[c0], bq2[c0]) * 0.55
    hi = max(bq1[c1], bq2[c1]) * 1.45
    hi = min(hi, 3950.0)
    best = None
    rng = np.random.default_rng(v * 5 + gi)
    for t in range(24):
        if t == 0:
            p0 = np.concatenate([[bq1[c0], bq1[c1], bq2[c0], bq2[c1]],
                                 gc_warm])
        else:
            f0 = rng.uniform(lo, hi)
            f1 = rng.uniform(f0 + 30, min(hi + 400, 3990))
            f2 = rng.uniform(lo, hi)
            f3 = rng.uniform(f2 + 30, min(hi + 400, 3990))
            p0 = np.array([f0, f1, f2, f3, *gc_warm])
        try:
            res = least_squares(resid, p0, xtol=3e-16, ftol=3e-16,
                                max_nfev=600)
        except Exception:
            continue
        r = float(np.abs(res.fun).max())
        if best is None or r < best[1]:
            best = (res.x, r)
        if r < 3e-5:
            break
    p, r = best
    return gi, v, p[:4], p[4:8], r


def main():
    lsf, res, gc = load_sweep()
    _q1, _q2, bad = build_tables(lsf, res)
    print(f"refitting {len(bad)} rows")
    # gc warm start: median fitted gc across good probes
    gc_warm = np.nanmedian(np.concatenate([g for g in gc]), axis=0)
    tasks = [(g, v, gc_warm) for g, v, _ in bad]
    z = dict(np.load(LEARNED).items())
    fixed, still_bad = 0, []
    with ProcessPoolExecutor(max_workers=8) as ex:
        for gi, v, q, gcs, r in ex.map(refit_one, tasks):
            ok = q is not None and r < 1e-4
            print(f"g{gi} v{v}: resid {r:.2e}{'' if ok else '  STILL BAD'}",
                  flush=True)
            if ok:
                z[f"q1_{gi}"][v] = q[0:2]
                z[f"q2_{gi}"][v] = q[2:4]
                fixed += 1
            else:
                still_bad.append((gi, v, r))
    np.savez(LEARNED, **z)
    print(f"fixed {fixed}/{len(bad)}; still bad: {still_bad}")


if __name__ == "__main__":
    main()
