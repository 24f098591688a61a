"""Parameterized replica of the lavc amrnb float decode chain, used to
RECOVER spec tables/constants by fitting against black-box oracle output
(oracle.py). Structure follows 3GPP TS 26.090 decoder knowledge; every
uncertain constant is a parameter so fits against the oracle both recover
values and validate structure (a wrong structure can't reach float32
residuals).

Chain per 40-sample subframe, given excitation exc and LP coeffs a[0..9]
(convention A(z) = 1 + sum a_i z^-(i+1), i.e. synthesis x(n) = exc(n) -
sum a_i x(n-1-i)):

  x   = 1/A(z) exc                       (synthesis, memory m_syn)
  r   = A(z/gn) x                        (postfilter numerator)
  v   = 1/A(z/gd) r                      (postfilter denominator, m_pf)
  t   = v - mu v(n-1), mu = tilt_fac*k1  (tilt compensation, k1 from the
                                          truncated impulse response of
                                          A(z/gn)/A(z/gd))
  y   = agc(t; E_x)                      (per-sample smoothed gain
                                          g(n) = a g(n-1) + (1-a) sqrt(Ex/Et))
  out = biquad HP (60 Hz) * scale
"""

from __future__ import annotations

import numpy as np


def synth(exc, a, mem):
    """1/A(z) with A = 1 + sum a_i z^-(i+1); mem = last 10 outputs
    (mem[-1] = x(n-1))."""
    p = len(a)
    x = np.concatenate([mem, np.zeros(len(exc))])
    for n in range(len(exc)):
        x[p + n] = exc[n] - np.dot(a[::-1], x[n:n + p])
    return x[p:], x[len(exc):]


def fir_az(x, a, gamma, mem):
    """A(z/gamma) x = x(n) + sum a_i gamma^(i+1) x(n-1-i)."""
    w = a * gamma ** np.arange(1, len(a) + 1)
    xx = np.concatenate([mem, x])
    p = len(a)
    out = np.empty(len(x))
    for n in range(len(x)):
        out[n] = xx[p + n] + np.dot(w[::-1], xx[n:n + p])
    return out, xx[len(x):]


def iir_az(r, a, gamma, mem):
    w = a * gamma ** np.arange(1, len(a) + 1)
    p = len(a)
    v = np.concatenate([mem, np.zeros(len(r))])
    for n in range(len(r)):
        v[p + n] = r[n] - np.dot(w[::-1], v[n:n + p])
    return v[p:], v[len(r):]


def k1_truncated(a, gn, gd, nh=22):
    """First reflection coefficient of the formant postfilter's truncated
    impulse response (TS 26.090 tilt compensation)."""
    imp = np.zeros(nh)
    imp[0] = 1.0
    r, _ = fir_az(imp, a, gn, np.zeros(len(a)))
    h, _ = iir_az(r, a, gd, np.zeros(len(a)))
    rh0 = np.dot(h, h)
    rh1 = np.dot(h[:-1], h[1:])
    return rh1 / rh0 if rh0 > 0 else 0.0


def subframe_chain(exc, a, st, gn=0.7, gd=0.75, tilt_fac=0.8,
                   tilt_clamp=True, agc_alpha=0.9):
    """One postfiltered subframe. `st` is a dict of filter memories, mutated.
    Returns the 40 postfiltered samples (before the output HP filter).

    Postfilter realization (pinned by frame-1 multi-subframe fits): the
    POLE filter 1/A(z/gd) runs first on the synthesis signal, then the
    ZERO filter A(z/gn) runs over the pole filter's output, BOTH reading
    the same pole-output history across subframe boundaries. (The
    num-first cascade is equivalent only with zero initial state — it
    fits subframe 0 but diverges from the oracle at subframes 2+.)"""
    x, st["m_syn"] = synth(exc, a, st["m_syn"])
    v_tail_prev = st["m_den"]
    v, st["m_den"] = iir_az(x, a, gd, v_tail_prev)
    v, _ = fir_az(v, a, gn, v_tail_prev)
    k1 = k1_truncated(a, gn, gd)
    mu = tilt_fac * k1
    if tilt_clamp and mu < 0:
        mu = 0.0
    t = np.empty(len(v))
    prev = st["m_tilt"]
    for n in range(len(v)):
        t[n] = v[n] - mu * prev
        prev = v[n]
    st["m_tilt"] = prev
    ex = np.dot(x, x)
    et = np.dot(t, t)
    g_target = np.sqrt(ex / et) if et > 0 else 1.0
    g = st["m_agc"]
    y = np.empty(len(t))
    for n in range(len(t)):
        g = agc_alpha * g + (1.0 - agc_alpha) * g_target
        y[n] = t[n] * g
    st["m_agc"] = g
    return y


def hp_biquad(y, b, a2, mem):
    """Order-2 transfer function: out = b0 y + b1 y1 + b2 y2 + a1 o1 + a2 o2.
    mem = [y1, y2, o1, o2]."""
    y1, y2, o1, o2 = mem
    out = np.empty(len(y))
    for n in range(len(y)):
        o = b[0] * y[n] + b[1] * y1 + b[2] * y2 + a2[0] * o1 + a2[1] * o2
        y2, y1 = y1, y[n]
        o2, o1 = o1, o
        out[n] = o
    return out, [y1, y2, o1, o2]


def fresh_state(p=10):
    return {"m_syn": np.zeros(p), "m_num": np.zeros(p), "m_den": np.zeros(p),
            "m_tilt": 0.0, "m_agc": 0.0, "m_hp": [0.0, 0.0, 0.0, 0.0]}
