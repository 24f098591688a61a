"""Sequential per-subframe chain fit for a full MR122 frame-1 probe.

With the chain constants frozen (fit_chain.py), each subframe k of a
frame-1 probe is fit on its own 40 samples for (a_k[10], gc_k), with all
filter memories propagated from the previous subframes' fitted values.
Valid for probes whose gp indices are 0 (no adaptive contribution, no
sharpening, no gain smoothing) and whose sign/position bits are 0 (fixed
code = +2 pulse pairs at positions 0..4) — i.e. LSF/gc-index probes.

Returns per-subframe LP coefficients, the raw material for LSF codebook
recovery (fit_frame -> A(z) roots -> LSP -> solve interpolation).
"""

import numpy as np
from scipy.optimize import least_squares

import replica

HPG = 0.939819336
HPP = np.array([1.933106017, -0.935913627])
CHAIN = dict(gn=0.7, gd=0.75, tilt_fac=0.8, tilt_clamp=False, agc_alpha=0.9)


def run_subframe(a, gc, st, hp_mem, signs=None):
    exc = np.zeros(40)
    exc[:5] = 2.0 * (signs if signs is not None else np.ones(5))
    exc *= gc
    y = replica.subframe_chain(exc, a, st, **CHAIN)
    out, hp_mem = replica.hp_biquad(y, np.array([1.0, -2.0, 1.0]) * HPG,
                                    HPP, hp_mem)
    return out, hp_mem


def _clone(st):
    return {k: (v.copy() if hasattr(v, "copy") else v) for k, v in st.items()}


def fit_frame1(pcm160, a0, gc0, verbose=False):
    """Fit (a_k, gc_k) for k=0..3 sequentially. a0/gc0: warm starts."""
    return fit_frame_seq(pcm160, a0, gc0, replica.fresh_state(),
                         [0.0] * 4, verbose=verbose)


def fit_frame_seq(pcm160, a0, gc0, st, hp_mem, verbose=False, signs=None):
    """Sequential per-subframe (a, gc) fit with CARRIED-IN chain state
    (st, hp_mem are mutated), for frames past the first of a probe
    stream: the caller advances the replica through the known earlier
    frames first. Valid when the frame's excitation is the all-zero-code
    pulse pattern only (gp index 0 -> zero adaptive gain & sharpening)."""
    out_a, out_gc, resids = [], [], []
    scale = np.abs(pcm160).max()
    for k in range(4):
        target = pcm160[40 * k:40 * (k + 1)]
        st_in, hp_in = _clone(st), list(hp_mem)

        def resid(p):
            stx, hpx = _clone(st_in), list(hp_in)
            out, _ = run_subframe(p[:10], p[10], stx, hpx, signs=signs)
            return (out - target) / scale

        x0 = np.concatenate([np.asarray(a0[k] if np.ndim(a0) == 2 else a0),
                             [gc0[k] if np.ndim(gc0) == 1 else gc0]])
        res = least_squares(resid, x0, xtol=3e-16, ftol=3e-16, max_nfev=800)
        out_a.append(res.x[:10])
        out_gc.append(res.x[10])
        resids.append(float(np.abs(res.fun).max()))
        # advance state with the fitted params
        _, new_hp = run_subframe(res.x[:10], res.x[10], st, hp_mem,
                                 signs=signs)
        hp_mem[:] = new_hp
        if verbose:
            print(f"  sf{k}: resid {resids[-1]:.2e} gc {res.x[10]:.3e}")
    return np.array(out_a), np.array(out_gc), resids


def a_to_lsf(a):
    """LP coefficients (A(z) = 1 + sum a_i z^-(i+1)) -> 10 LSFs in Hz
    (8 kHz), via P/Q symmetric polynomial roots."""
    A = np.concatenate([[1.0], a])
    Az = np.concatenate([A, [0.0]])           # A(z), degree 11 slot
    Ar = np.concatenate([[0.0], A[::-1]])     # z^-11 A(z^-1)
    P = Az + Ar                                # symmetric, degree 11
    Q = Az - Ar                                # antisymmetric, degree 11
    # remove the known roots at z=-1 (P) and z=+1 (Q)
    P = np.polydiv(P, [1.0, 1.0])[0]
    Q = np.polydiv(Q, [1.0, -1.0])[0]
    ang = []
    for poly in (P, Q):
        r = np.roots(poly)
        w = np.angle(r)
        w = w[(w > 1e-9) & (w < np.pi - 1e-9)]
        ang.extend(w)
    ang = np.sort(np.asarray(ang))
    assert len(ang) == 10, len(ang)
    return ang * 8000.0 / (2 * np.pi)


if __name__ == "__main__":
    from fit_chain import probe

    xf = np.load("/tmp/chain_frozen.npy")
    pcm = np.concatenate([probe([]), ])
    # full 160 samples of frame 1
    from oracle import decode_bits, NB_BITS
    pcm = decode_bits(7, [[0] * NB_BITS[7]])[:160].astype(np.float64)
    a, gc, r = fit_frame1(pcm, xf[:10], xf[10], verbose=True)
    print("resids:", [f"{x:.2e}" for x in r])
    for k in range(4):
        print(f"sf{k} lsf:", np.array2string(a_to_lsf(a[k]), precision=1))
