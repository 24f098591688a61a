"""Exact (ISF <-> A) parametrization for order-16 LP at 12.8 kHz.

ISF vector convention (matches TS 26.190's interleaving): 16 entries,
even indices 0,2,..,14 are the 8 root frequencies of
F1(z) = A(z) + z^-16 A(1/z), odd indices 1,3,..,13 the 7 root
frequencies of F2(z) = A(z) - z^-16 A(1/z) (after removing its fixed
z=+-1 roots), and entry 15 carries a_16 mapped as an angle-like value
f15 = acos(a16)*12800/(2 pi) so all entries are Hz-scaled.

Reconstruction: F1* = prod quadratics(even), F2* = (z^2-1)/..., and
A = [(1+a16) F1* + (1-a16) F2*] / 2, which is exact (monic, and
F1+F2 = 2A by definition with leading coefficients 1+-a16).
"""

from __future__ import annotations

import numpy as np


def a_to_isf(a16poly):
    a = np.asarray(a16poly, float)
    assert len(a) == 17 and abs(a[0] - 1) < 1e-9
    f1 = a + a[::-1]
    f2 = a - a[::-1]

    def deflate(p, root):
        out = np.zeros(len(p) - 1)
        r_ = p.copy()
        for i in range(len(out)):
            out[i] = r_[i]
            r_[i + 1] -= root * out[i]
        return out

    f2d = deflate(deflate(f2, 1.0), -1.0)

    def angles(poly, expect):
        rr = np.roots(poly)
        rr = rr[np.imag(rr) > 1e-9]
        if len(rr) > expect:
            q = np.abs(np.abs(rr) - 1.0)
            rr = rr[np.argsort(q)[:expect]]
        ang = np.sort(np.angle(rr))
        if len(ang) < expect:   # roots collapsed onto the real axis
            ang = np.concatenate([ang, [np.pi * 0.98] * (expect - len(ang))])
        return ang

    t1 = angles(f1, 8)
    t2 = angles(f2d, 7)
    a16 = a[16]
    isf = np.zeros(16)
    isf[0:15:2] = t1 * 12800 / (2 * np.pi)
    isf[1:14:2] = t2 * 12800 / (2 * np.pi)
    isf[15] = np.arccos(np.clip(a16, -1, 1)) * 12800 / (2 * np.pi)
    return isf


def isf_to_a(isf):
    isf = np.asarray(isf, float)
    t1 = isf[0:15:2] * 2 * np.pi / 12800
    t2 = isf[1:14:2] * 2 * np.pi / 12800
    a16 = np.cos(isf[15] * 2 * np.pi / 12800)

    def polyprod(ts, pre):
        p = np.array(pre, float)
        for t in ts:
            p = np.convolve(p, [1.0, -2 * np.cos(t), 1.0])
        return p

    F1 = polyprod(t1, [1.0])
    F2 = polyprod(t2, [1.0, 0.0, -1.0])
    return 0.5 * ((1 + a16) * F1 + (1 - a16) * F2)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    # random stable-ish A: product of damped quadratics
    a = np.array([1.0])
    for _ in range(8):
        r = 0.55 + 0.4 * rng.random()
        th = np.pi * rng.random()
        a = np.convolve(a, [1, -2 * r * np.cos(th), r * r])
    isf = a_to_isf(a)
    a2 = isf_to_a(isf)
    print("roundtrip max err:", np.abs(a - a2).max())
