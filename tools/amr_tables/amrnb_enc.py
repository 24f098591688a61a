"""MR122 (AMR-NB 12.2 kbps) encoder prototype, analysis-by-synthesis
against the probe-recovered decoder replica (amrnb_dec.py).

Structure follows classic CELP practice (TS 26.090-style analysis), but
every quantizer/table/bit-layout detail comes from the black-box
recovery in this lab (FACTS.md): LSF split-matrix tables, pitch/code
gain tables, the 244-bit storage map, pulse-position Gray coding, and
the decoder's feedback truncation. The encoder mirrors the decoder
state exactly, so its searches see what the real decoder will see.

Verification: streams are decoded with BOTH amrnb_dec.py and the
in-image lavc `amrnb` decoder (oracle.py); see probe_enc.py.
"""

from __future__ import annotations

import numpy as np

import amrnb_dec as D
from refit_bad import hz_to_cos, lsp_to_a, reorder_lsf

L_SF = 40
GAMMA1, GAMMA2 = 0.9, 0.6   # MR122 perceptual weighting


# ----------------------------------------------------------------- LPC
def levinson(r):
    a = np.zeros(11)
    a[0] = 1.0
    e = r[0]
    for i in range(1, 11):
        acc = r[i] + np.dot(a[1:i], r[i - 1:0:-1])
        k = -acc / e
        a[1:i] = a[1:i] + k * a[i - 1:0:-1]
        a[i] = k
        e *= (1 - k * k)
        if e <= 0:
            e = 1e-12
    return a[1:]


def lp_analysis(frame, mem):
    """Two LP analyses per frame over [mem(80) | frame(160)], windows
    emphasizing subframe 2 and subframe 4 respectively."""
    buf = np.concatenate([mem, frame])
    out = []
    for n1, n2 in ((160, 80), (232, 8)):
        w = np.concatenate([
            0.54 - 0.46 * np.cos(2 * np.pi * np.arange(n1) / (2 * n1 - 1)),
            np.cos(2 * np.pi * np.arange(n2) / (4 * n2 - 1))])
        x = buf * w
        r = np.array([np.dot(x[:240 - k], x[k:]) for k in range(11)])
        r[0] *= 1.0001
        if r[0] < 1e-10:
            r[0] = 1e-10
        r *= np.exp(-0.5 * (2 * np.pi * 60.0 * np.arange(11) / 8000.0) ** 2)
        out.append(levinson(r))
    return out


def a_to_lsf_hz(a):
    """LP -> 10 LSFs (Hz, ascending) via Chebyshev-series evaluation of
    the sum/difference polynomials on a dense theta grid + bisection."""
    A = np.concatenate([[1.0], a])
    P1 = np.concatenate([A, [0.0]]) + np.concatenate([[0.0], A])[::-1]
    Q1 = np.concatenate([A, [0.0]]) - np.concatenate([[0.0], A])[::-1]
    p = _synth_div(P1, -1.0)   # divide by (1 + z^-1)
    q = _synth_div(Q1, 1.0)    # divide by (1 - z^-1)
    thetas = np.linspace(1e-4, np.pi - 1e-4, 1024)
    roots = []
    for c in (p, q):
        def f(th, c=c):
            return (2.0 * sum(c[k] * np.cos((5 - k) * th) for k in range(5))
                    + c[5])
        vals = f(thetas)
        for i in range(len(thetas) - 1):
            if vals[i] * vals[i + 1] <= 0.0:
                lo, hi = thetas[i], thetas[i + 1]
                flo = f(lo)
                for _ in range(40):
                    mid = 0.5 * (lo + hi)
                    fm = f(mid)
                    if flo * fm <= 0:
                        hi = mid
                    else:
                        lo, flo = mid, fm
                roots.append(0.5 * (lo + hi))
    roots = np.sort(np.asarray(roots))[:10]
    if len(roots) < 10:   # degenerate filter: pad evenly
        roots = np.sort(np.concatenate(
            [roots, np.linspace(0.1, 3.0, 10 - len(roots))]))
    return roots * 8000.0 / (2 * np.pi)


def _synth_div(poly, root):
    """poly / (1 - root z^-1) by synthetic division (exact for our
    palindromic/antipalindromic inputs)."""
    out = np.zeros(len(poly) - 1)
    acc = 0.0
    for i in range(len(out)):
        acc = poly[i] + root * acc
        out[i] = acc
    return out


# ------------------------------------------------------- LSF quantizer
def lsf_quantize(lsf1, lsf2, past_r):
    """Joint split-matrix quantization of both LSF sets; returns
    (rows[5], q1_hz, q2_hz, selected_r2)."""
    base = D.MEAN_LSF + D.LSF_PRED_FAC * past_r
    r1 = lsf1 - base
    r2 = lsf2 - base
    rows, q1, q2, sel = [], np.empty(10), np.empty(10), np.empty(10)
    for g in range(5):
        tgt = np.concatenate([r1[2 * g:2 * g + 2], r2[2 * g:2 * g + 2]])
        tab = D.LSF_TABLES[g]
        if g == 2:
            ep = ((tab - tgt) ** 2).sum(1)
            en = ((tab + tgt) ** 2).sum(1)
            ip, in_ = int(ep.argmin()), int(en.argmin())
            if en[in_] < ep[ip]:
                rows.append(in_ | 256)
                row = -tab[in_]
            else:
                rows.append(ip)
                row = tab[ip]
        else:
            i = int(((tab - tgt) ** 2).sum(1).argmin())
            rows.append(i)
            row = tab[i]
        q1[2 * g:2 * g + 2] = base[2 * g:2 * g + 2] + row[:2]
        q2[2 * g:2 * g + 2] = base[2 * g:2 * g + 2] + row[2:]
        sel[2 * g:2 * g + 2] = row[2:]
    return rows, reorder_lsf(q1), reorder_lsf(q2), sel


# --------------------------------------------------------- filter utils
def fir10(x, w, mem):
    xx = np.concatenate([mem, x])
    out = np.empty(len(x))
    for n in range(len(x)):
        out[n] = xx[10 + n] + np.dot(w[::-1], xx[n:n + 10])
    return out, xx[-10:]


def iir10(x, w, mem):
    y = np.concatenate([mem, np.zeros(len(x))])
    for n in range(len(x)):
        y[10 + n] = x[n] - np.dot(w[::-1], y[n:n + 10])
    return y[10:], y[-10:]


def weighted_ir(a_q, n=L_SF):
    """Impulse response of H(z) = A(z/g1) / (A_q(z) A(z/g2))."""
    w1 = a_q * GAMMA1 ** np.arange(1, 11)
    w2 = a_q * GAMMA2 ** np.arange(1, 11)
    x = np.zeros(n)
    x[:11] = np.concatenate([[1.0], w1])[:min(11, n)]
    y, _ = iir10(x, a_q, np.zeros(10))
    h, _ = iir10(y, w2, np.zeros(10))
    return h


def conv_h(sig, h):
    return np.convolve(sig, h)[:len(sig)]


def write_field(bits, positions, val):
    for b, v in zip(positions, format(val, f"0{len(positions)}b")):
        bits[b] = int(v)


# ------------------------------------------------- ACELP 10-pulse search
def acelp_search(x2, h):
    """Greedy + refinement search of 10 pulses (2 per track, +-1) on
    tracks i%5, maximizing (d^T c)^2 / (c^T Phi c). Incremental updates
    keep it O(pulses * 80) per sweep."""
    d = np.correlate(x2, h, mode="full")[L_SF - 1:]
    H = np.zeros((L_SF, L_SF))
    for i in range(L_SF):
        H[i, i:] = h[:L_SF - i]
    phi = H @ H.T

    code = np.zeros(L_SF)
    pc = np.zeros(L_SF)          # phi @ code
    dc = 0.0                     # d . code
    den = 0.0                    # code phi code
    pos = [0] * 10
    sgn = [1.0] * 10

    def gain(p, s):
        num = dc + s * d[p]
        dn = den + 2 * s * pc[p] + phi[p, p]
        return num * num / max(dn, 1e-12)

    def place(j, t):
        nonlocal dc, den
        best = None
        for p in range(t, L_SF, 5):
            for s in (1.0, -1.0):
                sc = gain(p, s)
                if best is None or sc > best[0]:
                    best = (sc, p, s)
        _, p, s = best
        code[p] += s
        dc += s * d[p]
        den += 2 * s * pc[p] + phi[p, p]
        pc[:] += s * phi[p]
        pos[j], sgn[j] = p, s

    def remove(j):
        nonlocal dc, den
        p, s = pos[j], sgn[j]
        code[p] -= s
        dc -= s * d[p]
        pc[:] -= s * phi[p]
        den -= 2 * s * pc[p] + phi[p, p]

    for rnd in range(2):
        for t in range(5):
            place(5 * rnd + t, t)
    for _ in range(3):
        for j in range(10):
            remove(j)
            place(j, j % 5)

    # express as per-track pairs with the representable sign pattern
    pos_vals = [0] * 10
    sgn_vals = [0] * 5
    final = np.zeros(L_SF)
    for t in range(5):
        pA, sA = pos[t], sgn[t]
        pB, sB = pos[t + 5], sgn[t + 5]
        if sA == sB:
            p0, p1, s0 = min(pA, pB), max(pA, pB), sA
        elif pA > pB:
            p0, p1, s0 = pA, pB, sA
        else:
            p0, p1, s0 = pB, pA, sB
        pos_vals[t] = (p0 - t) // 5
        pos_vals[t + 5] = (p1 - t) // 5
        sgn_vals[t] = 0 if s0 > 0 else 1
        final[p0] += s0
        final[p1] += s0 if p1 >= p0 else -s0
    return final, pos_vals, sgn_vals


# ------------------------------------------------------------- encoder
class MR122Encoder:
    def __init__(self, trace=None):
        self.trace = trace              # optional per-subframe debug list
        self.dec = D.MR122Decoder()     # mirrored decoder-side state
        self.sp_mem = np.zeros(80)      # past input for LP windows
        self.ol_hist = np.zeros(143)    # open-loop pitch history
        self.synth_mem = np.zeros(10)   # 1/A_q over quantized excitation
        self.wn_mem = np.zeros(10)      # A(z/g1) FIR over input
        self.wd_mem = np.zeros(10)      # 1/A(z/g2) IIR (input path)
        self.wqn_mem = np.zeros(10)     # A(z/g1) FIR over quantized synth
        self.wqd_mem = np.zeros(10)     # 1/A(z/g2) IIR (quantized path)
        self.sw_mem_in = np.zeros(10)   # open-loop weighting memories
        self.sw_mem_out = np.zeros(10)

    def encode_frame(self, frame):
        frame = np.asarray(frame, np.float64)
        a1, a2 = lp_analysis(frame, self.sp_mem)
        lsf1 = np.sort(a_to_lsf_hz(a1))
        lsf2 = np.sort(a_to_lsf_hz(a2))
        rows, q1, q2, sel_r2 = lsf_quantize(lsf1, lsf2, self.dec.past_r)
        self.dec.past_r = sel_r2
        l1, l2 = hz_to_cos(q1), hz_to_cos(q2)
        if self.dec.past_lsp is None:
            self.dec.past_lsp = np.array(
                [30000, 26000, 21000, 15000, 8000, 0, -8000, -15000,
                 -21000, -26000]) / 32768.0
        lsps = [0.5 * self.dec.past_lsp + 0.5 * l1, l1,
                0.5 * l1 + 0.5 * l2, l2]
        self.dec.past_lsp = l2

        bits = [0] * 244
        for g, row in enumerate(rows):
            write_field(bits, D.LSF_GROUP_BITS[g], row)

        # open-loop pitch on perceptually weighted speech (state-free
        # approximation using this frame's first LP set)
        a_w = lsp_to_a(np.sort(lsps[1])[::-1])
        w1 = a_w * GAMMA1 ** np.arange(1, 11)
        w2 = a_w * GAMMA2 ** np.arange(1, 11)
        t1, _ = fir10(frame, w1, self.sw_mem_in)
        swf, _ = iir10(t1, w2, self.sw_mem_out)
        self.sw_mem_in = frame[-10:]
        self.sw_mem_out = swf[-10:]
        T_ops = [self._open_loop(swf[:80]), self._open_loop(swf[80:])]
        for k in range(4):
            a_q = lsp_to_a(np.sort(lsps[k])[::-1])
            self._subframe(bits, k, frame[L_SF * k:L_SF * (k + 1)],
                           a_q, T_ops[k // 2])
        self.sp_mem = frame[-80:]
        return bits

    def _open_loop(self, seg):
        buf = np.concatenate([self.ol_hist, seg])
        L = len(seg)
        best, bT = -1e18, 40
        x0 = buf[-L:]
        for T in range(18, 144):
            x1 = buf[-L - T:len(buf) - T]
            c = np.dot(x0, x1)
            if c <= 0:
                continue
            score = c / np.sqrt(np.dot(x1, x1) + 1e-9)
            if score > best:
                best, bT = score, T
        self.ol_hist = buf[-143:]
        return bT

    def _subframe(self, bits, k, sub, a_q, T_op):
        dec = self.dec
        w1 = a_q * GAMMA1 ** np.arange(1, 11)
        w2 = a_q * GAMMA2 ** np.arange(1, 11)
        h = weighted_ir(a_q)

        # weighted input (continuous input-side state)
        t1, self.wn_mem = fir10(sub, w1, self.wn_mem)
        sw, self.wd_mem = iir10(t1, w2, self.wd_mem)
        # ringing of the quantized path: ZIR of 1/A_q -> W, with states
        zir_s, _ = iir10(np.zeros(L_SF), a_q, self.synth_mem)
        zt, _ = fir10(zir_s, w1, self.wqn_mem)
        zw, _ = iir10(zt, w2, self.wqd_mem)
        x = sw - zw

        # ---- adaptive codebook search
        cands = []
        if k in (0, 2):
            for T0 in range(max(18, T_op - 5), min(143, T_op + 5) + 1):
                for frac in range(-3, 4):
                    idx = (T0 - 17) * 6 + frac - 3
                    if 0 <= idx < 463:
                        dT, df = D.dec_lag6_abs(idx)
                        cands.append((idx, dT, df))
        else:
            for idx in range(64):
                dT, df = D.dec_lag6_rel(idx, dec.T0_prev)
                if 18 <= dT <= 143:
                    cands.append((idx, dT, df))
        best = None
        for idx, dT, df in cands:
            v = D.pred_lt_6(dec.exc_hist, dT, df)
            y1 = conv_h(v, h)
            dn = np.dot(y1, y1)
            if dn < 1e-14:
                continue
            nm = np.dot(x, y1)
            sc = nm * nm / dn if nm > 0 else nm * 1e-6
            if best is None or sc > best[0]:
                best = (sc, idx, dT, df, v, y1)
        if best is None:
            idx = 0
            if k in (1, 3):
                T0, frac = D.dec_lag6_rel(0, dec.T0_prev)
            else:
                T0, frac = D.dec_lag6_abs(0)
            v = D.pred_lt_6(dec.exc_hist, T0, frac)
            y1 = conv_h(v, h)
        else:
            _, idx, T0, frac, v, y1 = best
        write_field(bits, D.LAG_BITS[k], idx)
        dec.T0_prev = T0

        # exact gp quantization: minimize |x - g y1|^2 over the table
        e_yy = np.dot(y1, y1)
        e_xy = np.dot(x, y1)
        errs = e_yy * D.QUA_GAIN_PITCH ** 2 - 2 * e_xy * D.QUA_GAIN_PITCH
        gp_idx = int(errs.argmin())
        gp = D.QUA_GAIN_PITCH[gp_idx]

        # ---- fixed codebook (sharpening folded into the search IR)
        x2 = x - gp * y1
        sharp = min(gp, D.SHARP_MAX)
        hs = h.copy()
        if T0 < L_SF:
            for n in range(T0, L_SF):
                hs[n] += sharp * hs[n - T0]
        code, pos_vals, sgn_vals = acelp_search(x2, hs)
        for j in range(10):
            fld = D.POS_BITS[k][3 * j:3 * j + 3]
            raw = D.DGRAY.index(pos_vals[j])
            bits[fld[2]] = (raw >> 2) & 1
            bits[fld[1]] = (raw >> 1) & 1
            bits[fld[0]] = raw & 1
        for i in range(5):
            bits[D.SIGN_BITS[k][i]] = sgn_vals[i]

        code_s = code.copy()
        if T0 < L_SF:
            for n in range(T0, L_SF):
                code_s[n] += sharp * code_s[n - T0]

        # ---- code gain via the decoder's predictor + correction table,
        # quantized by exact weighted error; then one gp<->gc refinement
        y2 = conv_h(code_s, h)
        ec_db = 10.0 * np.log10(max(np.dot(code_s, code_s), 1e-12) / L_SF)
        ep = float(np.dot(D.PRED_MA, dec.ener_pred))
        gc0 = 10.0 ** (0.05 * (ep + D.MEAN_ENER - ec_db)) / 16384.0
        gcands = gc0 * D.QUA_GAIN_CODE
        e_y2y2 = np.dot(y2, y2)
        e_y1y2 = np.dot(y1, y2)
        e_xy2 = np.dot(x, y2)
        for _ in range(2):
            # best gc given gp: |x - gp y1 - g y2|^2
            c1 = e_xy2 - gp * e_y1y2
            errs = e_y2y2 * gcands ** 2 - 2 * c1 * gcands
            gc_idx = int(errs.argmin())
            gc = gcands[gc_idx]
            # best gp given gc
            c2 = e_xy - gc * e_y1y2
            errs = e_yy * D.QUA_GAIN_PITCH ** 2 - 2 * c2 * D.QUA_GAIN_PITCH
            gp_idx = int(errs.argmin())
            gp = D.QUA_GAIN_PITCH[gp_idx]
        # the decoder sharpens with the FINAL gp: rebuild the code path
        # under it and re-pick gc (gp frozen from here)
        sharp = min(gp, D.SHARP_MAX)
        code_s = code.copy()
        if T0 < L_SF:
            for n in range(T0, L_SF):
                code_s[n] += sharp * code_s[n - T0]
        y2 = conv_h(code_s, h)
        ec_db = 10.0 * np.log10(max(np.dot(code_s, code_s), 1e-12) / L_SF)
        gc0 = 10.0 ** (0.05 * (ep + D.MEAN_ENER - ec_db)) / 16384.0
        gcands = gc0 * D.QUA_GAIN_CODE
        c1 = np.dot(x, y2) - gp * np.dot(y1, y2)
        errs = np.dot(y2, y2) * gcands ** 2 - 2 * c1 * gcands
        gc_idx = int(errs.argmin())
        gc = gcands[gc_idx]
        write_field(bits, D.GP_BITS[k], gp_idx)
        write_field(bits, D.GC_BITS[k], gc_idx)
        dec.ener_pred = [20.0 * np.log10(D.QUA_GAIN_CODE[gc_idx])] \
            + dec.ener_pred[:3]

        if self.trace is not None:
            self.trace.append(dict(x=x, y1=y1, y2=y2, gp=gp, gc=gc,
                                   T0=T0, a_q=a_q, v=v, code_s=code_s))
        # ---- mirror the decoder's state update
        exc = gp * v + gc * code_s
        fb = np.trunc(exc * 16384.0) / 16384.0 if D.FB_TRUNC else exc
        dec.exc_hist = np.concatenate([dec.exc_hist[L_SF:], fb])
        syn, self.synth_mem = iir10(exc, a_q, self.synth_mem)
        qt, self.wqn_mem = fir10(syn, w1, self.wqn_mem)
        _, self.wqd_mem = iir10(qt, w2, self.wqd_mem)


def encode(samples):
    """float samples (output-unit scale ~ +-1) -> list of 244-bit frames."""
    enc = MR122Encoder()
    n = max(1, (len(samples) + 159) // 160)
    samples = np.concatenate([samples, np.zeros(160 * n - len(samples))])
    return [enc.encode_frame(samples[160 * i:160 * (i + 1)])
            for i in range(n)]
