"""AMR-NB low-mode (modes 0..6, 4.75-10.2 kbps) encoder prototype,
analysis-by-synthesis against the probe-recovered decoder replica
(amrnb_low.py). Same structure as the MR122 encoder (amrnb_enc.py):
classic CELP analysis, but every quantizer/table/bit-layout detail comes
from the black-box recovery in this lab (FACTS.md).

The encoder mirrors the decoder state exactly by committing each
subframe through the pinned decode laws (lags, codebooks, gain
predictor, feedback truncation), so its searches see what the real
decoder will see. MR475's joint 2-subframe gain VQ is handled with a
snapshot/replay: both subframes are searched under tentative
unquantized gains, the 256-row joint table is scanned, then both
subframes are re-committed through the decode path with the quantized
row.

Verification: probe_low_enc.py encodes test signals per mode and decodes
the streams on the in-image lavc `amrnb` decoder (oracle.py).
"""

from __future__ import annotations

import numpy as np

import amrnb_low as L
from amrnb_dec import QUA_GAIN_CODE
from amrnb_enc import (levinson, a_to_lsf_hz, fir10, iir10, conv_h,
                       write_field)
from refit_bad import hz_to_cos, lsp_to_a, reorder_lsf

L_SF = 40
GAMMA1, GAMMA2 = 0.94, 0.6   # low-mode perceptual weighting

MODE_IDX = L.MODE_IDX
SCALE = L.SCALE


# ----------------------------------------------------------------- LPC
def lp_single(frame, mem):
    """One LP analysis per frame (low modes): asymmetric window
    emphasizing subframe 4 over [mem(80) | frame(160)]."""
    buf = np.concatenate([mem, frame])
    n1, n2 = 232, 8
    w = np.concatenate([
        0.54 - 0.46 * np.cos(2 * np.pi * np.arange(n1) / (2 * n1 - 1)),
        np.cos(2 * np.pi * np.arange(n2) / (4 * n2 - 1))])
    x = buf * w
    r = np.array([np.dot(x[:240 - k], x[k:]) for k in range(11)])
    r[0] *= 1.0001
    if r[0] < 1e-10:
        r[0] = 1e-10
    r *= np.exp(-0.5 * (2 * np.pi * 60.0 * np.arange(11) / 8000.0) ** 2)
    return levinson(r)


# ------------------------------------------------------- LSF quantizer
def lsf_quantize_3(mode, lsf_hz, past_r):
    """3-split residual quantization (table units). Returns
    (idx[3], q_hz_unordered, r_sel)."""
    tgt = lsf_hz * SCALE - L.MEAN_LSF_3 - L.PRED_FAC * past_r
    groups = [(0, 3), (3, 6), (6, 10)]
    if mode == "7k95":
        tabs = [L.LSF_3_1_795, L.LSF_3_2, L.LSF_3_3]
        strides = [1, 1, 1]
    elif mode in ("4k75", "5k15"):
        tabs = [L.LSF_3_1, L.LSF_3_2[::2], L.LSF_3_3_515]
        strides = [1, 2, 1]
    else:
        tabs = [L.LSF_3_1, L.LSF_3_2, L.LSF_3_3]
        strides = [1, 1, 1]
    idx = []
    r_sel = np.empty(10)
    for g, (lo, hi) in enumerate(groups):
        tab = tabs[g]
        err = ((tab - tgt[lo:hi]) ** 2).sum(1)
        i = int(err.argmin())
        idx.append(i)
        r_sel[lo:hi] = tab[i]
    q_hz = (L.MEAN_LSF_3 + r_sel + L.PRED_FAC * past_r) / SCALE
    return idx, q_hz, r_sel


def weighted_ir(a_q, n=L_SF):
    w1 = a_q * GAMMA1 ** np.arange(1, 11)
    w2 = a_q * GAMMA2 ** np.arange(1, 11)
    x = np.zeros(n)
    x[:11] = np.concatenate([[1.0], w1])[:min(11, n)]
    y, _ = iir10(x, a_q, np.zeros(10))
    h, _ = iir10(y, w2, np.zeros(10))
    return h


# ------------------------------------------------ fixed-code searches
# All searches maximize (d.c)^2 / (c' Phi c) with d = correlation of the
# target with the (sharpened) IR and Phi its autocorrelation matrix.
# Signs are preset per position from sign(d) (classic ACELP practice);
# the 2-pulse modes search signs exhaustively (cheap).
def _d_phi(x2, hs):
    d = np.correlate(x2, hs, mode="full")[L_SF - 1:]
    H = np.zeros((L_SF, L_SF))
    for i in range(L_SF):
        H[i, i:] = hs[:L_SF - i]
    phi = H @ H.T
    return d, phi


def search_2_9bit(sf, d, phi):
    """MR475/MR515: exhaustive over track-pair config i, 8x8 positions,
    4 sign combos (512 candidates, optimal)."""
    best = None
    for i in range(2):
        t0, t1 = L.STARTPOS[i][sf]
        P0 = t0 + 5 * np.arange(8)
        P1 = t1 + 5 * np.arange(8)
        d0 = d[P0]
        d1 = d[P1]
        ph00 = phi[P0, P0]
        ph11 = phi[P1, P1]
        ph01 = phi[np.ix_(P0, P1)]
        for s0 in (1.0, -1.0):
            for s1 in (1.0, -1.0):
                num = s0 * d0[:, None] + s1 * d1[None, :]
                den = (ph00[:, None] + ph11[None, :]
                       + 2.0 * s0 * s1 * ph01)
                sc = num * num / np.maximum(den, 1e-12)
                j = int(sc.argmax())
                p0, p1 = j // 8, j % 8
                if best is None or sc.flat[j] > best[0]:
                    best = (sc.flat[j], i, p0, p1, s0, s1)
    _, i, p0, p1, s0, s1 = best
    t0, t1 = L.STARTPOS[i][sf]
    if s0 * d[t0 + 5 * p0] + s1 * d[t1 + 5 * p1] < 0:
        s0, s1 = -s0, -s1  # mirrored pattern, same score, positive corr
    pos_field = (i << 6) | (p1 << 3) | p0
    sign_field = (1 if s0 > 0 else 0) | ((1 if s1 > 0 else 0) << 1)
    return pos_field, sign_field


def _preset_exhaustive(d, phi, pos_lists):
    """Exhaustive position search with signs preset from sign(d).
    pos_lists: list of np arrays of candidate positions per pulse.
    Returns (per-pulse field values as indices into pos_lists, signs)."""
    s = np.where(d >= 0, 1.0, -1.0)
    ds = np.abs(d)
    phiS = phi * s[:, None] * s[None, :]
    np_ = len(pos_lists)
    shapes = [len(p) for p in pos_lists]
    num = np.zeros(shapes)
    den = np.zeros(shapes)
    for i, P in enumerate(pos_lists):
        sh = [1] * np_
        sh[i] = shapes[i]
        num += ds[P].reshape(sh)
        den += phi[P, P].reshape(sh)
        for j in range(i):
            Q = pos_lists[j]
            cross = 2.0 * phiS[np.ix_(Q, P)]
            sh2 = [1] * np_
            sh2[j] = shapes[j]
            sh2[i] = shapes[i]
            den += cross.reshape(sh2)
    sc = num * num / np.maximum(den, 1e-12)
    j = np.unravel_index(int(sc.argmax()), shapes)
    picks = [int(v) for v in j]
    sgns = [1.0 if s[pos_lists[i][picks[i]]] > 0 else -1.0
            for i in range(np_)]
    return picks, sgns


def search_5k9(d, phi):
    P0 = np.array([5 * (v >> 2) + (0, 1, 2, 4)[v & 3] for v in range(32)])
    P1 = np.array([1 + 5 * (v >> 1) + 2 * (v & 1) for v in range(16)])
    (v0, v1), (s0, s1) = _preset_exhaustive(d, phi, [P0, P1])
    pos_field = (v0 << 4) | v1
    sign_field = (1 if s1 > 0 else 0) | ((1 if s0 > 0 else 0) << 1)
    return pos_field, sign_field


def search_6k7(d, phi):
    P0 = np.array([5 * v for v in range(8)])
    P1 = np.array([1 + 5 * (v >> 1) + 2 * (v & 1) for v in range(16)])
    P2 = np.array([2 + 5 * (v >> 1) + 2 * (v & 1) for v in range(16)])
    (v0, v1, v2), (s0, s1, s2) = _preset_exhaustive(d, phi, [P0, P1, P2])
    pos_field = v0 | (v1 << 3) | (v2 << 7)
    sign_field = ((1 if s0 > 0 else 0) | ((1 if s1 > 0 else 0) << 1)
                  | ((1 if s2 > 0 else 0) << 2))
    return pos_field, sign_field


GRAY = [0, 1, 3, 2, 6, 4, 5, 7]  # inverse of DGRAY


def search_7k4(d, phi):
    P0 = np.array([0 + 5 * L.DGRAY[v] for v in range(8)])
    P1 = np.array([1 + 5 * L.DGRAY[v] for v in range(8)])
    P2 = np.array([2 + 5 * L.DGRAY[v] for v in range(8)])
    P3 = np.array([(3 + (v & 1)) + 5 * L.DGRAY[v >> 1] for v in range(16)])
    (v0, v1, v2, v3), sg = _preset_exhaustive(d, phi, [P0, P1, P2, P3])
    pos_field = v0 | (v1 << 3) | (v2 << 6) | (v3 << 9)
    sign_field = sum((1 if sg[i] > 0 else 0) << i for i in range(4))
    return pos_field, sign_field


# ---- MR102: greedy 8-pulse (2 per track of 10) on the smoothed basis
def _mr102_reverse():
    r4, r5, r6 = {}, {}, {}
    for k, v in L.MR102_T4.items():
        r4.setdefault(tuple(v), k)
    for k, v in L.MR102_T5.items():
        r5.setdefault(tuple(v), k)
    for k, v in L.MR102_T6.items():
        r6.setdefault(tuple(v), k)
    return r4, r5, r6


MR102_R4, MR102_R5, MR102_R6 = _mr102_reverse()


def search_10k2(x2, hs):
    """Greedy + refinement over the smoothed pulse basis: each position
    p contributes a circularly-shifted kernel, filtered by hs."""
    # basis y_p = conv(hs, kernel circularly shifted to p)
    K = np.empty((L_SF, L_SF))
    for p in range(L_SF):
        K[p] = np.roll(L.MR102_KERNEL, p)
    H = np.zeros((L_SF, L_SF))
    for i in range(L_SF):
        H[i, i:] = hs[:L_SF - i]
    Y = K @ H            # Y[p] = filtered smoothed impulse at p
    d = Y @ x2
    phi = Y @ Y.T
    pc = np.zeros(L_SF)
    dc = 0.0
    den = 0.0
    pos = [0] * 8
    sgn = [1.0] * 8

    def place(j, t):
        nonlocal dc, den
        best = None
        for p in range(t, L_SF, 4):
            for s in (1.0, -1.0):
                nm = dc + s * d[p]
                dn = den + 2 * s * pc[p] + phi[p, p]
                sc = nm * nm / max(dn, 1e-12)
                if best is None or sc > best[0]:
                    best = (sc, p, s)
        _, p, s = best
        dc += s * d[p]
        den += 2 * s * pc[p] + phi[p, p]
        pc[:] += s * phi[p]
        pos[j], sgn[j] = p, s

    def remove(j):
        nonlocal dc, den
        p, s = pos[j], sgn[j]
        dc -= s * d[p]
        pc[:] -= s * phi[p]
        den -= 2 * s * pc[p] + phi[p, p]

    for rnd in range(2):
        for t in range(4):
            place(4 * rnd + t, t)
    for _ in range(3):
        for j in range(8):
            remove(j)
            place(j, j % 4)
    if dc < 0:   # decoded gains are positive: keep the code correlated
        sgn = [-s for s in sgn]

    # express per track as an ordered pair + sign bit (decode law:
    # second pulse flips iff its position is strictly lower)
    fields = {}
    signs = 0
    pairs = []
    for t in range(4):
        pA, sA = pos[t], sgn[t]
        pB, sB = pos[t + 4], sgn[t + 4]
        jA, jB = (pA - t) // 4, (pB - t) // 4
        if sA == sB:
            first, second, s = min(jA, jB), max(jA, jB), sA
        elif jA > jB:
            first, second, s = jA, jB, sA
        else:
            first, second, s = jB, jA, sB
        pairs.append((first, second))
        if s < 0:          # MR102 sign convention: bit 1 -> -1
            signs |= 1 << t
    (a0, a1), (b0, b1), (c0, c1), (d0, d1) = pairs
    fields["pulse4"] = MR102_R4[(a0, a1, b0)]
    fields["pulse5"] = MR102_R5[(c0, c1, b1)]
    fields["pulse6"] = MR102_R6[(d0, d1)]
    for t in range(4):
        fields[f"pulse{t}"] = (signs >> t) & 1
    return fields


# ------------------------------------------------------------- encoder
class LowEncoder:
    def __init__(self, mode):
        assert mode in L.NPULSE, mode
        self.mode = mode
        self.F = L.fields(mode)
        # mirrored decoder-side state
        self.past_r = np.zeros(10)
        self.past_lsp = L.LSP_INIT.copy()
        self.exc_hist = np.zeros(154)
        self.state = dict(ener_pred=[L.ENER_INIT] * 4)
        self.T0_prev = 20
        self.gp_prev = 0.0
        # encoder-side state
        self.sp_mem = np.zeros(80)
        self.ol_hist = np.zeros(143)
        self.synth_mem = np.zeros(10)
        self.wn_mem = np.zeros(10)
        self.wd_mem = np.zeros(10)
        self.wqn_mem = np.zeros(10)
        self.wqd_mem = np.zeros(10)
        self.sw_mem_in = np.zeros(10)
        self.sw_mem_out = np.zeros(10)

    # ---- state snapshot for MR475's joint-pair replay
    _SNAP = ("exc_hist", "T0_prev", "gp_prev", "synth_mem", "wn_mem",
             "wd_mem", "wqn_mem", "wqd_mem")

    def _snapshot(self):
        s = {k: np.copy(getattr(self, k)) if isinstance(
            getattr(self, k), np.ndarray) else getattr(self, k)
            for k in self._SNAP}
        s["ener_pred"] = list(self.state["ener_pred"])
        return s

    def _restore(self, s):
        for k in self._SNAP:
            v = s[k]
            setattr(self, k, np.copy(v) if isinstance(v, np.ndarray)
                    else v)
        self.state["ener_pred"] = list(s["ener_pred"])

    def encode_frame(self, frame):
        frame = np.asarray(frame, np.float64)
        a = lp_single(frame, self.sp_mem)
        lsf = np.sort(a_to_lsf_hz(a))
        idx, q_hz, r_sel = lsf_quantize_3(self.mode, lsf, self.past_r)
        self.past_r = r_sel
        lsp_new = hz_to_cos(reorder_lsf(q_hz))

        bits = [0] * sum(len(b) for b in self.F.values())
        for g in range(3):
            write_field(bits, self.F[(f"lsf{g}", -1)], idx[g])

        lsps = [(1.0 - (k + 1) / 4.0) * self.past_lsp
                + ((k + 1) / 4.0) * lsp_new for k in range(4)]
        self.past_lsp = lsp_new

        # open-loop pitch on perceptually weighted speech
        a_w = lsp_to_a(np.sort(lsps[3])[::-1])
        w1 = a_w * GAMMA1 ** np.arange(1, 11)
        w2 = a_w * GAMMA2 ** np.arange(1, 11)
        t1, _ = fir10(frame, w1, self.sw_mem_in)
        swf, _ = iir10(t1, w2, self.sw_mem_out)
        self.sw_mem_in = frame[-10:]
        self.sw_mem_out = swf[-10:]
        T_ops = [self._open_loop(swf[:80]), self._open_loop(swf[80:])]

        a_qs = [lsp_to_a(np.sort(lsps[k])[::-1]) for k in range(4)]
        if self.mode == "4k75":
            for half in (0, 1):
                k0, k1 = 2 * half, 2 * half + 1
                snap = self._snapshot()
                i0 = self._subframe(bits, k0, frame, a_qs[k0],
                                    T_ops[half], joint=True)
                i1 = self._subframe(bits, k1, frame, a_qs[k1],
                                    T_ops[half], joint=True)
                row = self._joint_gain_pick(i0, i1)
                write_field(bits, self.F[("p_gain", k0)], row)
                self._restore(snap)
                self._commit_from_bits(bits, k0, a_qs[k0])
                self._commit_from_bits(bits, k1, a_qs[k1])
        else:
            for k in range(4):
                self._subframe(bits, k, frame, a_qs[k], T_ops[k // 2])
        self.sp_mem = frame[-80:]
        return bits

    def _open_loop(self, seg):
        buf = np.concatenate([self.ol_hist, seg])
        n = len(seg)
        best, bT = -1e18, 40
        x0 = buf[-n:]
        for T in range(20, 144):
            x1 = buf[-n - T:len(buf) - T]
            c = np.dot(x0, x1)
            if c <= 0:
                continue
            score = c / np.sqrt(np.dot(x1, x1) + 1e-9)
            if score > best:
                best, bT = score, T
        self.ol_hist = buf[-143:]
        return bT

    def _lag_candidates(self, k, T_op):
        lag_bits = self.F[("p_lag", k)]
        nb = len(lag_bits)
        cands = []
        if nb == 8:
            for T0 in range(max(20, T_op - 5), min(143, T_op + 5) + 1):
                for frac in (-1, 0, 1):
                    if T0 <= 84:
                        i = 3 * (T0 - 19) + frac - 1
                        if 0 <= i < 197:
                            cands.append((i,) + L.dec_lag3_abs(i))
                    elif frac == 0:
                        cands.append((T0 + 112,) + L.dec_lag3_abs(T0 + 112))
        else:
            for i in range(1 << nb):
                T0, frac = L.dec_lag3_rel(i, self.T0_prev, nb)
                if 20 <= T0 <= 143:
                    cands.append((i, T0, frac))
        return cands

    def _target(self, k, frame, a_q):
        sub = frame[L_SF * k:L_SF * (k + 1)]
        w1 = a_q * GAMMA1 ** np.arange(1, 11)
        w2 = a_q * GAMMA2 ** np.arange(1, 11)
        t1, self.wn_mem = fir10(sub, w1, self.wn_mem)
        sw, self.wd_mem = iir10(t1, w2, self.wd_mem)
        zir_s, _ = iir10(np.zeros(L_SF), a_q, self.synth_mem)
        zt, _ = fir10(zir_s, w1, self.wqn_mem)
        zw, _ = iir10(zt, w2, self.wqd_mem)
        return sw - zw

    def _subframe(self, bits, k, frame, a_q, T_op, joint=False):
        mode = self.mode
        h = weighted_ir(a_q)
        x = self._target(k, frame, a_q)

        # ---- adaptive codebook
        cands = self._lag_candidates(k, T_op)
        best = None
        for i, T0, frac in cands:
            v = L.pred_lt_3(self.exc_hist, T0, frac)
            y1 = conv_h(v, h)
            dn = np.dot(y1, y1)
            if dn < 1e-14:
                continue
            nm = np.dot(x, y1)
            sc = nm * nm / dn if nm > 0 else nm * 1e-6
            if best is None or sc > best[0]:
                best = (sc, i, T0, frac, v, y1)
        if best is None:  # zero history (stream start): any lag works
            i, T0, frac = cands[0]
            v = L.pred_lt_3(self.exc_hist, T0, frac)
            best = (0.0, i, T0, frac, v, conv_h(v, h))
        _, lag_idx, T0, frac, v, y1 = best
        write_field(bits, self.F[("p_lag", k)], lag_idx)
        self.T0_prev = T0

        e_yy = np.dot(y1, y1)
        e_xy = np.dot(x, y1)
        gp_unq = min(max(e_xy / max(e_yy, 1e-12), 0.0), 1.2)

        # ---- fixed codebook (sharpening from the PREVIOUS subframe's
        # decoded pitch gain, folded into the search IR)
        x2 = x - gp_unq * y1
        sharp = min(max(self.gp_prev, 0.0), L.SHARP_MAX)
        hs = h.copy()
        if T0 < L_SF:
            for n in range(T0, L_SF):
                hs[n] += sharp * hs[n - T0]
        if mode == "10k2":
            cfields = search_10k2(x2, hs)
            for name, val in cfields.items():
                write_field(bits, self.F[(name, k)], val)
            code = L.mr102_smooth(L.pulses_10k2(
                cfields["pulse4"], cfields["pulse5"], cfields["pulse6"],
                sum(cfields[f"pulse{j}"] << j for j in range(4))))
        else:
            d, phi = _d_phi(x2, hs)
            if mode in ("4k75", "5k15"):
                pos_field, sign_field = search_2_9bit(k, d, phi)
            elif mode == "5k9":
                pos_field, sign_field = search_5k9(d, phi)
            elif mode == "6k7":
                pos_field, sign_field = search_6k7(d, phi)
            else:
                pos_field, sign_field = search_7k4(d, phi)
            write_field(bits, self.F[("pulse0", k)], pos_field)
            write_field(bits, self.F[("pulse1", k)], sign_field)
            code = L.pulses_mode(mode, k, pos_field, sign_field)
        code_s = code.copy()
        if T0 < L_SF:
            for n in range(T0, L_SF):
                code_s[n] += sharp * code_s[n - T0]
        y2 = conv_h(code_s, h)

        # ---- gains
        mean_e = float(np.dot(code_s, code_s)) / L_SF
        ec_db = 10.0 * np.log10(mean_e if mean_e > 0 else 1.0)
        ep = float(np.dot(L.PRED_MA, self.state["ener_pred"]))
        gc0 = 10.0 ** (0.05 * (ep + L.ENERGY_MEAN[MODE_IDX[mode]]
                               - L.PRED_C - ec_db))
        e_y2y2 = np.dot(y2, y2)
        e_y1y2 = np.dot(y1, y2)
        e_xy2 = np.dot(x, y2)

        if joint:
            # MR475: defer gain quantization to the pair decision; commit
            # tentatively with unquantized gains and a NEUTRAL predictor
            # push (corr=1 -> 0 dB), so the pair evaluation can apply
            # corr0^0.68 exactly.
            gc_unq = max((e_xy2 - gp_unq * e_y1y2) / max(e_y2y2, 1e-12),
                         0.0)
            self.state["ener_pred"] = [0.0] + self.state["ener_pred"][:3]
            self._commit(k, a_q, v, code_s, gp_unq, gc_unq)
            return dict(gc0=gc0, e_yy=e_yy, e_xy=e_xy, e_y2y2=e_y2y2,
                        e_y1y2=e_y1y2, e_xy2=e_xy2)

        if mode == "7k95":
            errs = (e_yy * L.QUA_GAIN_PITCH_Q14 ** 2 / 16384.0 ** 2
                    - 2 * e_xy * L.QUA_GAIN_PITCH_Q14 / 16384.0)
            gp_idx = int(errs.argmin())
            gp = L.QUA_GAIN_PITCH_Q14[gp_idx] / 16384.0
            gcands = gc0 * 2.0 * QUA_GAIN_CODE
            c1 = e_xy2 - gp * e_y1y2
            errs = e_y2y2 * gcands ** 2 - 2 * c1 * gcands
            gc_idx = int(errs.argmin())
            gc = gcands[gc_idx]
            write_field(bits, self.F[("p_gain", k)], gp_idx)
            write_field(bits, self.F[("fixed_gain", k)], gc_idx)
            corr = 2.0 * QUA_GAIN_CODE[gc_idx]
        else:
            tab = (L.GAINS_HIGH if mode in ("6k7", "7k4", "10k2")
                   else L.GAINS_LOW)
            gps = tab[:, 0] / 16384.0
            gcs = gc0 * tab[:, 1] / 2048.0
            errs = (gps ** 2 * e_yy + gcs ** 2 * e_y2y2
                    + 2 * gps * gcs * e_y1y2
                    - 2 * gps * e_xy - 2 * gcs * e_xy2)
            gi = int(errs.argmin())
            gp, gc = gps[gi], gcs[gi]
            write_field(bits, self.F[("p_gain", k)], gi)
            corr = tab[gi, 1] / 2048.0
        self.state["ener_pred"] = ([20.0 * np.log10(corr)]
                                   + self.state["ener_pred"][:3])
        if getattr(self, "dbg", None) is not None:
            r = x - gp * y1 - gc * y2
            self.dbg.append(dict(
                k=k, ex=float(np.dot(x, x)), err=float(np.dot(r, r)),
                gp=gp, gc=gc, gp_unq=gp_unq,
                gc_unq=max((e_xy2 - gp * e_y1y2) / max(e_y2y2, 1e-12), 0.0),
                adapt_gain=float(e_xy ** 2 / max(e_yy, 1e-12)
                                 / max(np.dot(x, x), 1e-12))))
        self._commit(k, a_q, v, code_s, gp, gc)

    def _joint_gain_pick(self, i0, i1):
        """MR475 joint 2-subframe gain VQ: scan all 256 rows, exact
        predictor coupling (gc0_base of sf1 scales by corr0^0.68)."""
        tab = L.GAINS_MR475
        gp0 = tab[:, 0] / 16384.0
        c0 = tab[:, 1] / 2048.0
        gp1 = tab[:, 2] / 16384.0
        c1 = tab[:, 3] / 2048.0
        gc0 = i0["gc0"] * c0
        gc1 = i1["gc0"] * np.power(np.maximum(c0, 1e-6), 0.68) * c1
        errs = (gp0 ** 2 * i0["e_yy"] + gc0 ** 2 * i0["e_y2y2"]
                + 2 * gp0 * gc0 * i0["e_y1y2"]
                - 2 * gp0 * i0["e_xy"] - 2 * gc0 * i0["e_xy2"])
        errs += (gp1 ** 2 * i1["e_yy"] + gc1 ** 2 * i1["e_y2y2"]
                 + 2 * gp1 * gc1 * i1["e_y1y2"]
                 - 2 * gp1 * i1["e_xy"] - 2 * gc1 * i1["e_xy2"])
        return int(errs.argmin())

    def _commit(self, k, a_q, v, code_s, gp, gc):
        """Mirror the decoder's state update + quantized-path memories."""
        self.gp_prev = gp
        exc = gp * v + gc * code_s
        fb = np.trunc(exc * 16384.0) / 16384.0
        self.exc_hist = np.concatenate([self.exc_hist[L_SF:], fb])
        w1 = a_q * GAMMA1 ** np.arange(1, 11)
        w2 = a_q * GAMMA2 ** np.arange(1, 11)
        syn, self.synth_mem = iir10(exc, a_q, self.synth_mem)
        qt, self.wqn_mem = fir10(syn, w1, self.wqn_mem)
        _, self.wqd_mem = iir10(qt, w2, self.wqd_mem)

    def _commit_from_bits(self, bits, k, a_q):
        """Re-commit subframe k by DECODING its bits (MR475 replay after
        the joint gain decision) — guarantees decoder-state mirroring."""
        F = self.F
        lag_bits = F[("p_lag", k)]
        lag_idx = L.field_val(bits, lag_bits)
        if len(lag_bits) == 8:
            T0, frac = L.dec_lag3_abs(lag_idx)
        else:
            T0, frac = L.dec_lag3_rel(lag_idx, self.T0_prev, len(lag_bits))
        self.T0_prev = T0
        v = L.pred_lt_3(self.exc_hist, T0, frac)
        pos_field = L.field_val(bits, F[("pulse0", k)])
        sign_field = L.field_val(bits, F[("pulse1", k)])
        code = L.pulses_mode(self.mode, k, pos_field, sign_field)
        sharp = min(max(self.gp_prev, 0.0), L.SHARP_MAX)
        if T0 < L_SF:
            for n in range(T0, L_SF):
                code[n] += sharp * code[n - T0]
        rowi = L.field_val(bits, F[("p_gain", 2 * (k // 2))])
        row = L.GAINS_MR475[rowi]
        gvals = {"row475": row[2 * (k % 2): 2 * (k % 2) + 2]}
        gp, gc = L.gains_decode(self.mode, self.state, k, gvals, code)
        self._commit(k, a_q, v, code, gp, gc)


def encode(mode, samples):
    """float samples (output-unit scale ~ +-1) -> list of bit frames."""
    enc = LowEncoder(mode)
    n = max(1, (len(samples) + 159) // 160)
    samples = np.concatenate([samples, np.zeros(160 * n - len(samples))])
    return [enc.encode_frame(samples[160 * i:160 * (i + 1)])
            for i in range(n)]
