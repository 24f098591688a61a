"""Exact A(z) measurement for the WB ISF campaign (round 5).

The old lab measured ISFs by AR(17) fits of ringing time responses —
good to 20-50 Hz but warped at the band edges, which blocked matching
the binary codebooks.  This probe measures A(z) by SPECTRAL DIVISION
instead: a loud code burst in subframe 3 (new-ISF interpolation weight
1.0, tilt == 0 because all preceding subframes are quiet) has 12.8k
response  R(w) = gc * C(w) * D(w) * H(w) / A(w)  with C the known
4-pulse comb, D = 1/(1-0.68 z^-1) de-emphasis and H the 31 Hz output
biquad (binary constants).  So A(w) = gc * C D H / R up to the scalar
gc, and the 17 taps follow from a least-squares fit over good bins
(skipping C's nulls).  Monic normalization removes gc.

Usage: python3 probe_isf_exact.py            # zero-index ISF
       python3 probe_isf_exact.py f1a 1 ...  # with field assignments
"""

from __future__ import annotations

import sys

import numpy as np

import truedec as TD

FS = 12800


def measure_A(assign=None, nwarm=0, nfit=1536):
    """Return the monic A(z) (17 taps) seen by the sf3 burst."""
    burst = {"lag0": 120, "lag2": 120, "lag1": 0, "lag3": 63,
             "gain3": 114}
    if assign:
        burst.update(assign)
    pre = [TD.bits_with(dict(assign or {}))] * nwarm
    frames = pre + [TD.bits_with(burst)] + [TD.bits_with(dict(assign or {}))] * 2
    ora = TD.lavc(frames)
    x = TD.resample_16k_to_12k8(ora)
    s0 = nwarm * 256 + 192            # sf3 start
    r = x[s0:s0 + nfit].copy()
    N = 4096
    R = np.fft.rfft(r, N)
    w = np.arange(len(R)) * 2 * np.pi / N
    # known chain factors
    C = -2.0 * np.exp(-1j * np.outer(w, np.arange(4))).sum(1)
    D = 1.0 / (1.0 - 0.68 * np.exp(-1j * w))
    z1 = np.exp(-1j * w)
    H = 0.9895 * (1 - z1) ** 2 / (1 - 1.9789 * z1 + 0.97913 * z1 * z1)
    good = (w > 2 * np.pi * 60 / FS) & (w < 2 * np.pi * 5600 / FS)
    # jointly linear: R(w) * sum_k a_k e^{-iwk} - gc * C D H = 0
    Rg, Fg = R[good], (C * D * H)[good]
    E = Rg[:, None] * np.exp(-1j * np.outer(w[good], np.arange(17)))
    M = np.concatenate([E, -Fg[:, None]], axis=1)
    MM = np.concatenate([M.real, M.imag])
    # nontrivial solution: fix a0 = 1 -> move first column to rhs
    rhs = -MM[:, 0]
    sol, *_ = np.linalg.lstsq(MM[:, 1:], rhs, rcond=None)
    a = np.concatenate([[1.0], sol[:16]])
    pred = E @ a - sol[16] * Fg
    resid = float(np.linalg.norm(pred) /
                  np.linalg.norm(sol[16] * Fg + 1e-30))
    return a, resid


def a_to_isf_hz(a):
    sys.path.insert(0, ".")
    import isf_param as IP
    return IP.a_to_isf(a)


if __name__ == "__main__":
    assign = {}
    args = sys.argv[1:]
    while len(args) >= 2:
        assign[args[0]] = int(args[1])
        args = args[2:]
    for nwarm in (0, 1, 3, 6):
        a, resid = measure_A(assign, nwarm=nwarm)
        isf = a_to_isf_hz(a)
        print(f"nwarm={nwarm} resid {resid:.4f} isf(Hz):",
              np.round(isf, 1))
