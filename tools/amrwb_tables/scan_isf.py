"""Measure the decoded ISF vector for every index of every ISF field
(the 7-split MSVQ of AMR-WB 12.65k) by log-spectral-ratio probing.

Method (see isf_lab.py for the probe protocol):
- For config I and the base config, decode the SAME coincident-pulse
  burst after 3 warm-up frames; the log ratio of their power spectra is
  exactly log|A_base(w)| - log|A_I(w)| (excitation, upsampler,
  deemphasis, gain all cancel).
- Fit A_I (order 17, deemphasis pole included) to the target
  log-magnitude by Gauss-Newton starting from the base fit; average
  the ratio over two different common codes for noise reduction.
- Extract the 16 ISFs (15 F1/F2 root frequencies + last coefficient)
  per index. Differences vs index 0 are the dico rows x (1+mu);
  absolute calibration and the MA factor come from a separate
  transient probe.

Writes learned/isf_meas.npz with isf[field][index] (Hz domain) and
the per-fit diagnostics.
"""

from __future__ import annotations

import os
import sys

import numpy as np

import wb
import isf_lab as L

HERE = os.path.dirname(os.path.abspath(__file__))
NFFT = 1024
BINS = slice(8, int(6200 / 16000 * NFFT) + 1)
CODES = (0, 3)   # coincident-pair positions used as common excitations


def vcode(p):
    v = 1 << 8
    for i in range(4):
        b = (p >> i) & 1
        v |= b << (2 * i) | b << (2 * i + 1)
    return v


def burst(assign, p, warm=3):
    fr = L.probe_frames(assign, warm)
    bu = list(fr[-1])
    for b in L.CODE_T0:
        bu[b] = 0
    vv = vcode(p)
    for i, b in enumerate(L.CODE_T0):
        if (vv >> (8 - i)) & 1:
            bu[b] = 1
    return wb.decode_bits(fr[:-1] + [bu])[320 * warm: 320 * warm + 320]


_W = np.ones(320)
_W[-40:] = np.hanning(80)[40:]


def pspec(assign, p):
    return np.abs(np.fft.rfft(burst(assign, p) * _W, NFFT)) ** 2


def log_ratio(assign, base_specs):
    """Average 0.5*(log P_I - log P_base) over the common codes."""
    acc = 0.0
    for p in CODES:
        acc = acc + 0.5 * (np.log(pspec(assign, p)[BINS])
                           - np.log(base_specs[p][BINS]))
    return acc / len(CODES)


# bins are on the 16 kHz output grid; A(z) runs at 12.8 kHz, so its
# angular frequency is 1.25x the output bin frequency.
OMEGA = (np.arange(NFFT // 2 + 1) * 2 * np.pi / NFFT)[BINS] * 1.25
_E = np.exp(-1j * np.outer(OMEGA, np.arange(0, 18)))  # e^{-jwk}, k=0..17


def logmagA(a):
    return np.log(np.abs(_E[:, :len(a)] @ a))


def gn_fit(target, a0, iters=8):
    """Gauss-Newton fit of monic order-17 a (a[0]=1) to log|A| target."""
    a = a0.copy()
    for _ in range(iters):
        Aw = _E[:, :len(a)] @ a
        r = np.log(np.abs(Aw)) - target
        J = (_E[:, 1:len(a)] / Aw[:, None]).real
        da, _, _, _ = np.linalg.lstsq(J, -r, rcond=None)
        a[1:] += da
        if np.linalg.norm(da) < 1e-9:
            break
    rel = float(np.sqrt(((logmagA(a) - target) ** 2).mean()))
    return a, rel


import isf_param as P


def deemph_conv(a16poly, d=0.68):
    return np.convolve(a16poly, [1.0, -d])


def deemph_deconv(a17poly, d=0.68):
    b = np.zeros(len(a17poly) - 1)
    rem = np.asarray(a17poly, float).copy()
    for i in range(len(b)):
        b[i] = rem[i]
        rem[i + 1] += d * b[i]
    return b, abs(rem[-1])


def gn_fit_isf(target, isf_base, coords, iters=12, init=None):
    """Gauss-Newton over the given ISF coordinates (Hz deltas) plus two
    nuisance parameters: a log-gain offset c (the decoder's fixed gain
    carries config-dependent smoothing) and a code tilt t (the decoder
    tilt-filters the fixed vector by (1 - t z^-1) with a voice-factor-
    dependent t, which does NOT cancel in the spectral ratio when the
    LP changes).  Model: logmag = log|A17(isf+d)| - log|1 - t e^-jw| + c.
    """
    nd = len(coords)
    x = np.zeros(nd + 2)
    if init is not None:
        x[:nd] = init

    def logmag(xv):
        isf = isf_base.copy()
        isf[list(coords)] += xv[:nd]
        t, c = xv[nd], xv[nd + 1]
        a = deemph_conv(P.isf_to_a(isf))
        return (logmagA(a) - np.log(np.abs(1 - t * np.exp(-1j * OMEGA)))
                + c)

    for _ in range(iters):
        m0 = logmag(x)
        r = m0 - target
        J = np.zeros((len(r), nd + 2))
        for j in range(nd + 2):
            dd = x.copy()
            h_ = 0.5 if j < nd else 0.01
            dd[j] += h_
            J[:, j] = (logmag(dd) - m0) / h_
        step, _, _, _ = np.linalg.lstsq(J, -r, rcond=None)
        step[:nd] = np.clip(step[:nd], -120, 120)
        step[nd] = np.clip(step[nd], -0.1, 0.1)
        x += step
        x[nd] = np.clip(x[nd], -0.9, 0.9)
        if np.abs(step).max() < 1e-3:
            break
    rel = float(np.sqrt(((logmag(x) - target) ** 2).mean()))
    return x[:nd], rel


def ar_fit(r16):
    """AR (covariance) fit of an order-17 filter from a burst response."""
    h = L.resample_to_128(r16, 256)
    order = 17
    rows = range(24, len(h))
    M = np.array([[h[t - k] for k in range(1, order + 1)] for t in rows])
    y = np.array([h[t] for t in rows])
    a, _, _, _ = np.linalg.lstsq(M, -y, rcond=None)
    return np.concatenate([[1.0], a])


def base_fit(warm=3):
    return ar_fit(burst({}, 0, warm))


def isf16(a17, deemph=0.68):
    b16, _, rem = L.isf_from_lp(a17, deemph)
    a = np.asarray(b16, float)
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

    def upper_angles(poly, expect):
        r_ = np.roots(poly)
        r_ = r_[np.imag(r_) > 1e-9]
        ang = np.sort(np.angle(r_))
        if len(ang) > expect:          # spurious near-real pairs split
            # keep the `expect` roots closest to the unit circle
            mag = np.abs(np.roots(poly))
            rr = np.roots(poly)
            rr = rr[np.imag(rr) > 1e-9]
            q = np.abs(np.abs(rr) - 1.0)
            keep = np.argsort(q)[:expect]
            ang = np.sort(np.angle(rr[keep]))
        elif len(ang) < expect:        # root collapsed onto real axis
            ang = np.concatenate([ang, [np.pi] * (expect - len(ang))])
        return ang

    fr1 = upper_angles(f1, 8)
    fr2 = upper_angles(f2d, 7)
    freqs = np.sort(np.concatenate([fr1, fr2])) * 12800 / (2 * np.pi)
    return np.concatenate([freqs[:15], [a[-1]]])


def discover_coords(f, a_base, isf_base, base_specs, probes=3):
    """Free-16 fits on a few indices -> which ISF coords the field moves."""
    nbits = len(L.FIELDS[f])
    n = 1 << nbits
    acc = np.zeros(16)
    for idx in (1, n // 2, n - 1)[:probes]:
        d = log_ratio({f: idx}, base_specs)
        a, rel = gn_fit(logmagA(a_base) - d, a_base)
        a16, _ = deemph_deconv(a)
        acc += np.abs(P.a_to_isf(a16) - isf_base)
    thr = 0.25 * acc.max()
    return [c for c in range(16) if acc[c] > thr], acc


def main():
    fields = sys.argv[1:] or list(L.FIELDS)
    a_base = base_fit()
    a16_base, rem = deemph_deconv(a_base)
    isf_base = P.a_to_isf(a16_base)
    # anchor all targets to the reconstructed base so the reduced-space
    # model is exact at delta=0 (the AR fit's non-factorable residue
    # would otherwise bias every fit; it cancels in isf differences)
    a_base = deemph_conv(P.isf_to_a(isf_base))
    print("base isf:", np.round(isf_base, 1), f"deemph rem {rem:.4f}")
    base_specs = {p: np.abs(np.fft.rfft(burst({}, p) * _W, NFFT)) ** 2
                  for p in CODES}
    store, diag, coord_map = {}, {}, {}
    for f in fields:
        coords, acc = discover_coords(f, a_base, isf_base, base_specs)
        print(f"field {f}: coords {coords} (|delta| profile "
              f"{np.round(acc, 1)})")
        coord_map[f] = coords
        nbits = len(L.FIELDS[f])
        n = 1 << nbits
        out = np.zeros((n, 16))
        rels = np.zeros(n)
        for idx in range(n):
            if idx == 0:
                out[idx] = isf_base
                continue
            d = log_ratio({f: idx}, base_specs)
            target = logmagA(a_base) - d
            # route 1: reduced-space GN from zero delta
            delta, rel = gn_fit_isf(target, isf_base, coords)
            # route 2: free coefficient fit -> ISF -> project to coords,
            # then refine in reduced space (handles big stage-1 jumps)
            a_free, rel_free = gn_fit(target, a_base)
            a16f, _ = deemph_deconv(a_free)
            isf_free = P.a_to_isf(a16f)
            d0 = (isf_free - isf_base)[coords]
            delta2, rel2 = gn_fit_isf(target, isf_base, coords, init=d0)
            if rel2 < rel:
                delta, rel = delta2, rel2
            if rel > 0.08:
                # route 3: AR fit of this config's own burst as init
                a_ar = ar_fit(burst({f: idx}, CODES[0]))
                a16a, _ = deemph_deconv(a_ar)
                d0 = (P.a_to_isf(a16a) - isf_base)[coords]
                delta3, rel3 = gn_fit_isf(target, isf_base, coords,
                                          init=d0, iters=16)
                if rel3 < rel:
                    delta, rel = delta3, rel3
            isf = isf_base.copy()
            isf[coords] += delta
            out[idx] = isf
            rels[idx] = rel
            if idx % 64 == 0:
                print(f"{f} {idx}/{n} rel={rel:.4f}", flush=True)
        store[f] = out
        diag[f] = rels
        print(f"field {f}: fit rel median {np.median(rels):.4f} "
              f"max {rels.max():.4f}")
    np.savez(os.path.join(HERE, "learned", "isf_meas.npz"),
             **{f"isf_{k}": v for k, v in store.items()},
             **{f"rel_{k}": v for k, v in diag.items()},
             **{f"coords_{k}": np.array(v) for k, v in coord_map.items()},
             isf_base=isf_base)
    print("saved learned/isf_meas.npz")





# ---------------------------------------------------------------------------
# Time-domain complex-transfer fitting (the production fitter).
# The magnitude-only ratio fit is biased when a config rings longer than
# the 320-sample window (stage-1 indices); predicting the config response
# as IFFT[ FFT(r_base) * A_base/A_I * (1 - t z^-1) * e^lg ] and fitting in
# the (lowpassed) time domain sidesteps the truncation bias and uses phase.
# ---------------------------------------------------------------------------
NF2 = 2048
_FREQS2 = np.arange(NF2 // 2 + 1) / NF2 * 16000
_OM2 = np.clip(2 * np.pi * _FREQS2 / 12800, 0, np.pi)
_LOWMASK = _FREQS2 < 6200


def _evec(a):
    return np.exp(-1j * np.outer(_OM2, np.arange(len(a)))) @ a


def _lp320(x):
    X = np.fft.rfft(x, NF2)
    X[~_LOWMASK] = 0
    return np.fft.irfft(X, NF2)[:320]


def fit_time(rbase_f, rI_lp, isf_base, coords, init=None, iters=15):
    """Fit ISF deltas (+ tilt, log-gain) in the time domain."""
    AB = None  # built per call from isf_base
    ab = deemph_conv(P.isf_to_a(isf_base))
    AB = _evec(ab)
    RB = np.fft.rfft(rbase_f, NF2)
    n = len(coords)
    x = np.zeros(n + 2)
    if init is not None:
        x[:n] = np.clip(init, -900, 900)

    def model(xv):
        isf = isf_base.copy()
        isf[list(coords)] += xv[:n]
        t, lg = xv[n], xv[n + 1]
        AI = _evec(deemph_conv(P.isf_to_a(isf)))
        ratio = AB / AI * (1 - t * np.exp(-1j * _OM2)) * np.exp(lg)
        ratio[~_LOWMASK] = 0
        return np.fft.irfft(RB * ratio, NF2)[:320]

    nr = np.linalg.norm(rI_lp)

    def cost(xv):
        m = model(xv)
        if not np.isfinite(m).all():
            return 9.9e9
        return float(np.linalg.norm(m - rI_lp) / nr)

    best_x, best_c = x.copy(), cost(x)
    for _ in range(iters):
        m0 = model(x)
        r = m0 - rI_lp
        J = np.zeros((320, n + 2))
        for j in range(n + 2):
            dd = x.copy()
            h_ = 0.5 if j < n else 0.01
            dd[j] += h_
            J[:, j] = (model(dd) - m0) / h_
        if not (np.isfinite(J).all() and np.isfinite(r).all()):
            break
        try:
            st, _, _, _ = np.linalg.lstsq(J, -r, rcond=None)
        except np.linalg.LinAlgError:
            break
        st[:n] = np.clip(st[:n], -150, 150)
        # backtracking line search on the relative residual
        scale = 1.0
        for _bt in range(6):
            xt = x + scale * st
            xt[:n] = np.clip(isf_base[list(coords)] + xt[:n],
                             40.0, 6350.0) - isf_base[list(coords)]
            c = cost(xt)
            if c < best_c:
                break
            scale *= 0.5
        if c < best_c:
            best_c, best_x = c, xt.copy()
            x = xt
        else:
            break
        if np.abs(scale * st).max() < 1e-3:
            break
    return best_x, best_c


# field -> ISF coords the reduced fit may move: the nominal split span
# plus neighbors (the decoder's ISF reordering couples adjacent coords)
FIELD_COORDS = {
    "f1a": list(range(0, 11)),
    "f1b": list(range(7, 16)),
    "f2a": list(range(0, 6)) + [15],
    "f2b": list(range(2, 9)) + [15],
    "f2c": list(range(4, 11)) + [15],
    "f2d": list(range(8, 14)) + [15],
    "f2e": list(range(10, 16)),
}


def main_time():
    fields = sys.argv[1:] or list(L.FIELDS)
    a_base = base_fit()
    a16_base, _ = deemph_deconv(a_base)
    isf_base = P.a_to_isf(a16_base)
    rbase = burst({}, 0)
    base_specs = {p: np.abs(np.fft.rfft(burst({}, p) * _W, NFFT)) ** 2
                  for p in CODES}
    ab_recon = deemph_conv(P.isf_to_a(isf_base))
    store, diag, coord_map = {}, {}, {}
    for f in fields:
        coords = FIELD_COORDS[f]
        print(f"field {f}: coords {coords}", flush=True)
        coord_map[f] = coords
        n = 1 << len(L.FIELDS[f])
        out = np.zeros((n, 16))
        rels = np.zeros(n)
        out[0] = isf_base
        for idx in range(1, n):
            rI = _lp320(burst({f: idx}, 0))
            a_ar = ar_fit(burst({f: idx}, CODES[0]))
            a16a, _ = deemph_deconv(a_ar)
            init = (P.a_to_isf(a16a) - isf_base)[coords]
            x, rel = fit_time(rbase, rI, isf_base, coords, init)
            if rel > 0.08:
                x2, rel2 = fit_time(rbase, rI, isf_base, coords, None)
                if rel2 < rel:
                    x, rel = x2, rel2
            isf = isf_base.copy()
            isf[coords] += x[:len(coords)]
            out[idx] = isf
            rels[idx] = rel
            if idx % 64 == 0:
                print(f"{f} {idx}/{n} rel={rel:.4f}", flush=True)
        store[f] = out
        diag[f] = rels
        print(f"field {f}: time-fit rel median {np.median(rels):.4f} "
              f"p90 {np.percentile(rels, 90):.4f} max {rels.max():.4f}",
              flush=True)
        np.savez(os.path.join(HERE, "learned", "isf_meas.npz"),
                 **{f"isf_{k}": v for k, v in store.items()},
                 **{f"rel_{k}": v for k, v in diag.items()},
                 **{f"coords_{k}": np.array(v)
                    for k, v in coord_map.items()},
                 isf_base=isf_base)
    print("saved learned/isf_meas.npz")


if __name__ == "__main__":
    main_time()
