"""Fit the MR122 frame-1/subframe-0 decode chain against the oracle.

Probes: the all-zero MR122 frame plus the five single sign-bit flips
({96,100,108,112,116} = signs of the pulse pairs at positions 0..4).
All six share the same subframe-0 LP filter and differ only in the known
excitation sign pattern, so a joint fit over 6x40 samples pins:
  a[10]   subframe-0 LP coefficients (interpolated init LSPs x LSF idx 0)
  gc      absolute excitation scale (pulse amp x fixed gain x out scale)
  pf      gamma_n, gamma_d, tilt factor, agc alpha
  hp      high-pass biquad poles + gain (zeros pinned at [1,-2,1])

Residual at float32 round-off validates the structure; anything worse
means the chain hypothesis is wrong.
"""

import numpy as np
from scipy.optimize import least_squares

from oracle import decode_bits, NB_BITS
import replica

M, N = 7, NB_BITS[7]
SIGN_BITS = [96, 100, 108, 112, 116]


def probe(flips):
    b = [0] * N
    for f in flips:
        b[f] = 1
    return decode_bits(M, [b])[:40].astype(np.float64)


def model(params, signs, opts):
    a = params[:10]
    gc = params[10]
    gn, gd, tilt_fac, agc_alpha = params[11:15]
    hp_gain, hp_a1, hp_a2 = params[15:18]
    beta0 = params[18] if opts.get("echo") else 0.0
    exc = np.zeros(40)
    for k in range(5):
        exc[k] = 2.0 * signs[k]
    if opts.get("echo"):
        T = opts.get("echo_T", 18)
        for n in range(T, 40):
            exc[n] += beta0 * exc[n - T]
    exc *= gc
    st = replica.fresh_state()
    y = replica.subframe_chain(exc, a, st, gn=gn, gd=gd, tilt_fac=tilt_fac,
                               tilt_clamp=opts.get("tilt_clamp", True),
                               agc_alpha=agc_alpha)
    out, _ = replica.hp_biquad(y, np.array([1.0, -2.0, 1.0]) * hp_gain,
                               np.array([hp_a1, hp_a2]), [0.0] * 4)
    return out


def fit(opts=None, verbose=True):
    opts = opts or {}
    targets = [probe([])] + [probe([b]) for b in SIGN_BITS]
    signsets = [np.ones(5)] + [
        np.array([-1.0 if i == k else 1.0 for i in range(5)])
        for k in range(5)
    ]
    scale = np.abs(targets[0]).max()

    def resid(params):
        r = []
        for t, s in zip(targets, signsets):
            r.append((model(params, s, opts) - t) / scale)
        return np.concatenate(r)

    x0 = np.zeros(19)
    x0[:10] = 0.0
    x0[10] = 1e-4
    x0[11:15] = [0.7, 0.75, 0.8, 0.9]
    x0[15:18] = [0.9398, 1.9331, -0.9359]
    x0[18] = 0.0
    res = least_squares(resid, x0, method="lm", xtol=1e-15, ftol=1e-15,
                        max_nfev=8000)
    if verbose:
        r = resid(res.x)
        print(f"max rel resid: {np.abs(r).max():.3e}")
        print("a:", np.array2string(res.x[:10], precision=6))
        print(f"gc={res.x[10]:.6e} gn={res.x[11]:.5f} gd={res.x[12]:.5f} "
              f"tilt={res.x[13]:.5f} agc={res.x[14]:.5f}")
        print(f"hp: gain={res.x[15]:.7f} a1={res.x[16]:.7f} a2={res.x[17]:.7f}"
              f" beta0={res.x[18]:.5f}")
    return res


if __name__ == "__main__":
    fit()
