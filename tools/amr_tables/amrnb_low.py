"""Generic AMR-NB low-mode (modes 0..6, 4.75-10.2 kbps) decoder replica,
assembled from the pinned facts (FACTS.md "Low-mode" section) plus
explicitly-marked hypotheses, each pinned by oracle probes
(probe_low_*.py) before anything ships to native/.

Pinned inputs:
- decode chain: gammas (0.55, 0.7), tilt 0.8*k1 unclamped, AGC 0.9,
  shared HP biquad (modes_lab.LOW_CHAIN)
- 3-split LSF residual tables + variants, mean_lsf_3, MA pred_fac
  (learned/lowmode_tables.npz, extract_lowmode_tables.py)
- joint gain VQ tables gains_MR475/gains_high/gains_low; energy means
  per mode; dispersion impulse responses (same npz)
- cos-domain LSP interpolation with weights k/4; lsp_init (FACTS.md)
- fixed-code sharpening uses the PREVIOUS subframe's pitch gain
- storage bit maps for every field (learned/order_maps.json)

Hypotheses (H*) marked inline; see probe_low_*.py for the pinning runs.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import replica  # noqa: E402
from fit_frame import HPG, HPP  # noqa: E402
from refit_bad import hz_to_cos, lsp_to_a, reorder_lsf  # noqa: E402
from amrnb_dec import pred_lt_6, QUA_GAIN_CODE, QUA_GAIN_PITCH  # noqa: E402

LOW_CHAIN = dict(gn=0.55, gd=0.7, tilt_fac=0.8, tilt_clamp=False,
                 agc_alpha=0.9)

_z = np.load(os.path.join(HERE, "learned", "lowmode_tables.npz"))
LSF_3_1 = _z["lsf_3_1"].astype(np.float64)
LSF_3_2 = _z["lsf_3_2"].astype(np.float64)
LSF_3_3 = _z["lsf_3_3"].astype(np.float64)
LSF_3_1_795 = _z["lsf_3_1_795"].astype(np.float64)
LSF_3_3_515 = _z["lsf_3_3_515"].astype(np.float64)
MEAN_LSF_3 = _z["mean_lsf_3"]          # table units; /4.096 = Hz
PRED_FAC = _z["pred_fac"]
GAINS_MR475 = _z["gains_MR475"].astype(np.float64)
GAINS_HIGH = _z["gains_high"].astype(np.float64)
GAINS_LOW = _z["gains_low"].astype(np.float64)
IR_FILTERS = _z["ir_filters"]
ENERGY_MEAN = _z["energy_mean"]        # per-mode MEAN_ENER, dB
QUA_GAIN_PITCH_Q14 = _z["qua_gain_pitch_q14"].astype(np.float64)
SCALE = 4.096

_order = json.load(open(os.path.join(HERE, "learned", "order_maps.json")))
MODE_IDX = {"4k75": 0, "5k15": 1, "5k9": 2, "6k7": 3, "7k4": 4,
            "7k95": 5, "10k2": 6, "12k2": 7}
NPULSE = {"4k75": 2, "5k15": 2, "5k9": 2, "6k7": 3, "7k4": 4,
          "7k95": 4, "10k2": 8}

# Fixed-gain energy predictor — PINNED by probe_low_pred.py +
# fit_low_pred.py (all 6 probeable modes, max err < 0.02 dB):
#   gc = corr * 10^(0.05*(epred + energy_mean[mode] - PRED_C - ecode_db))
#   epred_i = dot(PRED_MA, u_{i-1..i-4}), u = 20log10(corr), newest first
#   pre-stream state u = ENER_INIT
# 7k95's corr is 2*QUA_GAIN_CODE[idx] (twice the MR122 float ladder).
PRED_MA = np.array([0.68, 0.58, 0.34, 0.19])
ENER_INIT = -7.9803
PRED_C = 101.0849

# PINNED (probe_emph_law.py): the sharpening/emphasis clamp is
# Q14 13017/16384; driven by the PREVIOUS subframe's pitch gain.
SHARP_MAX = 13017.0 / 16384.0

LSP_INIT = np.array([30000, 26000, 21000, 15000, 8000, 0, -8000,
                     -15000, -21000, -26000]) / 32768.0


def fields(mode_name):
    return {(f["name"], f["subframe"]): f["bits"] for f in _order[mode_name]}


def field_val(bits, positions):
    v = 0
    for b in positions:
        v = (v << 1) | bits[b]
    return v


# ------------------------------------------------------------------ LSF
def lsf_decode_3(mode, idx0, idx1, idx2, past_r):
    """H-LSF3: 3-split residual decode. MR475/MR515 spend 8 bits on
    group 1 (table rows << 1) and 7 bits on group 2 (the MODE_5k15
    variant table); MR795 spends 9 bits on group 0 (its variant table).
    Returns (lsf_q_hz_unordered, r) with r in table units."""
    if mode == "7k95":
        r0 = LSF_3_1_795[idx0]
    else:
        r0 = LSF_3_1[idx0]
    if mode in ("4k75", "5k15"):
        r1 = LSF_3_2[idx1 << 1]
        r2 = LSF_3_3_515[idx2]
    else:
        r1 = LSF_3_2[idx1]
        r2 = LSF_3_3[idx2]
    r = np.concatenate([r0, r1, r2])
    lsf_q = MEAN_LSF_3 + r + PRED_FAC * past_r
    return lsf_q / SCALE, r


# ----------------------------------------------------------------- lags
# PINNED by probe_low_lags.py (learned/low_lag_probes.json). Convention:
# delay = T0 + frac/3 with frac in {-1,0,1}; the interpolator is the
# shared b60 via pred_lt_6(hist, T0, 2*frac).
def dec_lag3_abs(index):
    """Absolute 8-bit decode: fractional [19 1/3 .. 84 2/3] for idx<197
    (idx 0 -> 19+1/3), integer idx-112 above. Pinned at idx
    {0,100,197,255} plus the full-law confirm sweep."""
    if index < 197:
        T0 = (index + 2) // 3 + 19
        frac = index - 3 * (T0 - 19) + 1
    else:
        T0 = index - 112
        frac = 0
    return T0, frac


def dec_lag3_rel(index, T0_prev, nbits):
    """Relative decode around the previous subframe's integer lag.

    4 bits: T0_min = clip(T0_prev-5, [20,134]); idx 0..3 integer
    T0_min..+3; idx 4..12 the 1/3 grid T0_min+10/3 .. T0_min+6;
    idx 13..15 integer T0_min+7..+9.
    5 bits: T0_min = clip(T0_prev-5, [20,134]); delay = T0_min - 2/3
    + idx/3.
    6 bits (MR795): T0_min = clip(T0_prev-10, [20,124]); same 1/3 grid.
    """
    if nbits == 4:
        T0_min = min(max(T0_prev - 5, 20), 134)
        if index < 4:
            return T0_min + index, 0
        if index < 13:
            d3 = 3 * T0_min + index + 6
        else:
            return T0_min + index - 6, 0
    elif nbits == 5:
        T0_min = min(max(T0_prev - 5, 20), 134)
        d3 = 3 * T0_min + index - 2
    else:  # 6 bits
        T0_min = min(max(T0_prev - 10, 20), 124)
        d3 = 3 * T0_min + index - 2
    T0 = (d3 + 1) // 3
    frac = d3 - 3 * T0
    return T0, frac


def pred_lt_3(exc_hist, T0, frac, n=40):
    """1/3-resolution long-term prediction: the 6-phase b60 interpolator
    with the fraction doubled (3GPP Pred_lt_3or6 flag3=1)."""
    return pred_lt_6(exc_hist, T0, 2 * frac, n)


# --------------------------------------------------------- fixed codes
# Per-mode algebraic codebook layouts, PINNED by probe_low_pulses.py
# (learned/low_pulse_probes.json; verified exhaustively across all four
# subframes by verify_low_pulses.py). Sign convention everywhere:
# sign bit 0 -> -1, 1 -> +1. DGRAY is the same EFR Gray-decode table as
# MR122's position fields.
DGRAY = [0, 1, 3, 2, 5, 6, 4, 7]

# MR475/MR515 track pairs: startPos[ipos][subframe] -> (track0, track1)
STARTPOS = [
    [(0, 2), (0, 3), (0, 2), (0, 3)],
    [(1, 3), (2, 4), (1, 4), (1, 4)],
]


def _sgn(sign_field, bit):
    return 1.0 if (sign_field >> bit) & 1 else -1.0


def pulses_2_9bit(sf, pos_field, sign_field):
    """MR475/MR515: pos_field = [i(1) | p1(3) | p0(3)] MSB-first; track
    pair per STARTPOS; positions track + 5*p (no Gray). Sign LSB ->
    pulse 0 (lower track), bit1 -> pulse 1."""
    i = (pos_field >> 6) & 1
    p0 = pos_field & 7
    p1 = (pos_field >> 3) & 7
    t0, t1 = STARTPOS[i][sf]
    code = np.zeros(40)
    code[t0 + 5 * p0] += _sgn(sign_field, 0)
    code[t1 + 5 * p1] += _sgn(sign_field, 1)
    return code


def pulses_5k9(pos_field, sign_field):
    """MR59: i0 = 5 bits (bits 8..4): pos 5*(v>>2) + [0,1,2,4][v&3]
    (tracks T0/T1/T2/T4); i1 = 4 bits (bits 3..0): pos 1 + 5*(v>>1) +
    2*(v&1) (tracks T1/T3). Sign LSB -> i1, bit1 -> i0."""
    v0 = (pos_field >> 4) & 31
    v1 = pos_field & 15
    p0 = 5 * (v0 >> 2) + (0, 1, 2, 4)[v0 & 3]
    p1 = 1 + 5 * (v1 >> 1) + 2 * (v1 & 1)
    code = np.zeros(40)
    code[p0] += _sgn(sign_field, 1)
    code[p1] += _sgn(sign_field, 0)
    return code


def pulses_6k7(pos_field, sign_field):
    """MR67: i0 = bits 2..0: 5*v (track 0); i1 = bits 6..3: 1 + 5*(v>>1)
    + 2*(v&1) (T1/T3); i2 = bits 10..7: 2 + 5*(v>>1) + 2*(v&1) (T2/T4).
    Sign LSB -> i0, bit1 -> i1, bit2 -> i2."""
    p0 = 5 * (pos_field & 7)
    v1 = (pos_field >> 3) & 15
    v2 = (pos_field >> 7) & 15
    p1 = 1 + 5 * (v1 >> 1) + 2 * (v1 & 1)
    p2 = 2 + 5 * (v2 >> 1) + 2 * (v2 & 1)
    code = np.zeros(40)
    code[p0] += _sgn(sign_field, 0)
    code[p1] += _sgn(sign_field, 1)
    code[p2] += _sgn(sign_field, 2)
    return code


def pulses_7k4(pos_field, sign_field):
    """MR74/MR795 (shared codebook): i0/i1/i2 = 3 Gray bits each on
    tracks 0/1/2 (bits 2..0, 5..3, 8..6); i3 = 4 bits (12..9):
    (3 + (v&1)) + 5*DGRAY[v>>1] (T3/T4). Sign bit k -> pulse k."""
    code = np.zeros(40)
    for k in range(3):
        v = (pos_field >> (3 * k)) & 7
        code[k + 5 * DGRAY[v]] += _sgn(sign_field, k)
    v3 = (pos_field >> 9) & 15
    code[(3 + (v3 & 1)) + 5 * DGRAY[v3 >> 1]] += _sgn(sign_field, 3)
    return code


def pulses_mode(mode, sf, pos_field, sign_field):
    if mode in ("4k75", "5k15"):
        return pulses_2_9bit(sf, pos_field, sign_field)
    if mode == "5k9":
        return pulses_5k9(pos_field, sign_field)
    if mode == "6k7":
        return pulses_6k7(pos_field, sign_field)
    if mode in ("7k4", "7k95"):
        return pulses_7k4(pos_field, sign_field)
    raise NotImplementedError(mode)


# --------------------------------------------------------------- MR102
# Joint pulse coding PINNED by probe_mr102.py + fit_mr102.py (40/40
# random joint probes exact): 8 pulses, 2 per track (tracks k = {k,
# k+4, ..., k+36}); pulse4 (10 bits) -> (track0 ordered pair, track1
# first pulse A); pulse5 (10 bits) -> (track2 ordered pair, track1
# second pulse B); pulse6 (7 bits) -> track3 ordered pair. Sign bits
# pulse0..3 give the FIRST pulse's sign per track (0 -> +, 1 -> -,
# OPPOSITE of the other low modes); the second pulse flips iff its
# position is strictly lower. The innovation is then smoothed with a
# CIRCULAR 40-sample kernel (learned/mr102_kernel.npy).
_MR102 = json.load(open(os.path.join(HERE, "learned",
                                     "mr102_postables.json")))
MR102_T4 = {int(k): v for k, v in _MR102["T4"].items()}
MR102_T5 = {int(k): v for k, v in _MR102["T5"].items()}
MR102_T6 = {int(k): v for k, v in _MR102["T6"].items()}
MR102_KERNEL = np.load(os.path.join(HERE, "learned", "mr102_kernel.npy"))
MR102_KERNEL = MR102_KERNEL / MR102_KERNEL[0]


def pulses_10k2(p4, p5, p6, signs):
    """Plain (unsmoothed) MR102 integer pulse pattern."""
    a0, a1, A = MR102_T4[p4]
    c0, c1, B = MR102_T5[p5]
    d0, d1 = MR102_T6[p6]
    code = np.zeros(40)

    def add_pair(track, first, second, s):
        p1, p2 = track + 4 * first, track + 4 * second
        code[p1] += s
        code[p2] += s if p2 >= p1 else -s

    add_pair(0, a0, a1, -1.0 if signs & 1 else 1.0)
    add_pair(1, A, B, -1.0 if (signs >> 1) & 1 else 1.0)
    add_pair(2, c0, c1, -1.0 if (signs >> 2) & 1 else 1.0)
    add_pair(3, d0, d1, -1.0 if (signs >> 3) & 1 else 1.0)
    return code


def mr102_smooth(code):
    """Circular 40-sample convolution with the MR102 kernel."""
    return np.real(np.fft.ifft(np.fft.fft(code)
                               * np.fft.fft(MR102_KERNEL)))


# ------------------------------------------------------------ dispersion
def disp_circular(code, row):
    """Phase dispersion: CIRCULAR convolution of the innovation with
    ir_filters[row] inside the 40-sample subframe (pinned: late-pulse
    probe resid 1.8e-6 circular vs 0.43 linear-truncated). Synthesis
    path only — the adaptive codebook stores the undispersed
    excitation."""
    full = np.convolve(code, IR_FILTERS[row])
    out = full[:40].copy()
    out[:len(full) - 40] += full[40:]
    return out


# ----------------------------------------------------------------- gains
def gains_decode(mode, st, k, gvals, code):
    """Decode (gp, gc) for subframe k. gvals: dict of decoded gain field
    values for this subframe. Returns (gp, gc) and updates the MA
    predictor state in st.

    H-E0: degenerate all-zero codes (two pulses cancelling on the same
    position) use mean energy 1.0 so gc stays finite."""
    mean_e = float(np.dot(code, code)) / 40.0
    ecode_db = 10.0 * np.log10(mean_e if mean_e > 0.0 else 1.0)
    epred = float(np.dot(PRED_MA, st["ener_pred"]))
    gc0 = 10.0 ** (0.05 * (epred + ENERGY_MEAN[MODE_IDX[mode]]
                           - PRED_C - ecode_db))
    if mode == "7k95":
        # PINNED (diag row-aware fits): 7k95's pitch gains are the
        # STANDARD Q14 ladder from the binary @11347424 (0.5 = 8192),
        # not MR122's 0.9947x-scaled variant.
        gp = QUA_GAIN_PITCH_Q14[gvals["p_gain"]] / 16384.0
        corr = 2.0 * QUA_GAIN_CODE[gvals["fixed_gain"]]
        gc = gc0 * corr
        st["ener_pred"] = [20.0 * np.log10(corr)] + st["ener_pred"][:3]
        return gp, gc
    if mode in ("6k7", "7k4", "10k2"):
        row = GAINS_HIGH[gvals["p_gain"]]
    elif mode in ("5k15", "5k9"):
        row = GAINS_LOW[gvals["p_gain"]]
    else:  # 4k75: joint over subframe pairs, handled by caller passing
        # the right half of the row
        row = gvals["row475"]
    gp = row[0] / 16384.0
    corr = row[1] / 2048.0
    gc = gc0 * corr
    st["ener_pred"] = [20.0 * np.log10(corr)] + st["ener_pred"][:3]
    return gp, gc


# H-DISP: anti-sparseness selection state machine. Hypothesis space:
# per subframe a dispersion level nr in {0 strong, 1 medium, 2 none}
# chosen from the current pitch gain, with an onset detector on the
# fixed gain (ratio > 2 vs previous subframe), a 5-deep pitch-gain
# history vote, hysteresis vs the previous level, and a low-gain
# bypass. Modes 7k4 and 10k2 never filter (10k2's smoothing kernel is
# part of its codebook instead); 7k95 uses its own filter pair.
# Row mapping (binary rows @11344000): strong=row1 (peak 0.448),
# medium=row0 (peak 0.924); MR795 strong=row2 (peak 0.817).
DISP_ROWMAP = {"default": {0: 1, 1: 0}, "7k95": {0: 2, 1: 1}}
GC_INT = 16384.0  # output-float -> internal fixed-gain scale


def disp_select(st, gp, gc):
    """Update the anti-sparseness state and return nr in {0,1,2}."""
    st.gp_hist = st.gp_hist[1:] + [gp]
    gci = gc * GC_INT
    if gp < 0.6:
        nr = 0
    elif gp < 0.9:
        nr = 1
    else:
        nr = 2
    if gci > 2.0 * st.prev_sparse_gc:
        st.onset = 2
    elif st.onset:
        st.onset -= 1
    if not st.onset:
        if sum(1 for g in st.gp_hist if g < 0.6) > 2:
            nr = 0
        if nr > st.prev_nr + 1:
            nr -= 1
    elif nr < 2:
        nr += 1
    if gci < 5.0:
        nr = 2
    st.prev_sparse_gc = gci
    st.prev_nr = nr
    return nr


# ----------------------------------------------------------------- main
class LowDecoder:
    def __init__(self, mode, trace=None, disp_hook=None):
        assert mode in NPULSE, mode
        self.mode = mode
        self.F = fields(mode)
        self.trace = trace
        # disp_hook(self, sf, info) -> exc_syn: lets probe scripts try
        # phase-dispersion candidates against the oracle (the selection
        # law is the one un-pinned decoder-side stage). info carries
        # a/v/code/gp/gc/exc; the hook owns emphasis too.
        self.disp_hook = disp_hook
        self.st_chain = replica.fresh_state()
        self.hp = [0.0] * 4
        self.past_lsp = LSP_INIT.copy()
        self.past_r = np.zeros(10)
        self.exc_hist = np.zeros(154)
        self.state = dict(ener_pred=[ENER_INIT] * 4)
        self.gp_prev = 0.0
        self.T0_prev = 20
        # anti-sparseness state (H-DISP machine, probe_disp_rows.py)
        self.gp_hist = [0.0] * 5
        self.onset = 0
        self.prev_nr = 0
        self.prev_sparse_gc = 0.0

    def decode_frame(self, bits):
        bits = list(bits)
        F = self.F
        idx = [field_val(bits, F[(f"lsf{g}", -1)]) for g in range(3)]
        lsf_q, r = lsf_decode_3(self.mode, *idx, self.past_r)
        self.past_r = r
        lsp_new = hz_to_cos(reorder_lsf(lsf_q))
        out = np.empty(160)
        for k in range(4):
            w = (k + 1) / 4.0
            lsp = (1.0 - w) * self.past_lsp + w * lsp_new
            self._lsp_now = lsp  # exposed for diagnostics
            a = lsp_to_a(np.sort(lsp)[::-1])
            lag_bits = F[("p_lag", k)]
            lag_idx = field_val(bits, lag_bits)
            if len(lag_bits) == 8:
                T0, frac = dec_lag3_abs(lag_idx)
            else:
                T0, frac = dec_lag3_rel(lag_idx, self.T0_prev,
                                        len(lag_bits))
            self.T0_prev = T0
            v = pred_lt_3(self.exc_hist, T0, frac)
            if self.mode == "10k2":
                # H-MR102-FB: the smoothed code IS the innovation
                # everywhere (E_code, feedback, synthesis) — the kernel
                # is part of the codebook, not a dispersion stage.
                code = mr102_smooth(pulses_10k2(
                    field_val(bits, F[("pulse4", k)]),
                    field_val(bits, F[("pulse5", k)]),
                    field_val(bits, F[("pulse6", k)]),
                    sum(field_val(bits, F[(f"pulse{j}", k)]) << j
                        for j in range(4))))
            else:
                pos_field = field_val(bits, F[("pulse0", k)])
                sign_field = field_val(bits, F[("pulse1", k)])
                code = pulses_mode(self.mode, k, pos_field, sign_field)
            sharp = min(max(self.gp_prev, 0.0), SHARP_MAX)
            if T0 < 40:
                for n in range(T0, 40):
                    code[n] += sharp * code[n - T0]
            gvals = {}
            if self.mode == "4k75":
                half = k // 2
                rowi = field_val(bits, F[("p_gain", 2 * half)])
                row = GAINS_MR475[rowi]
                gvals["row475"] = row[2 * (k % 2): 2 * (k % 2) + 2]
            else:
                gvals["p_gain"] = field_val(bits, F[("p_gain", k)])
                if self.mode == "7k95":
                    gvals["fixed_gain"] = field_val(
                        bits, F[("fixed_gain", k)])
            gp, gc = gains_decode(self.mode, self.state, k, gvals, code)
            self.gp_prev = gp
            exc = gp * v + gc * code
            fb = np.trunc(exc * 16384.0) / 16384.0
            self.exc_hist = np.concatenate([self.exc_hist[40:], fb])
            nr = disp_select(self, gp, gc)
            if self.disp_hook is not None:
                exc_syn = self.disp_hook(self, k, dict(
                    a=a, v=v, code=code, gp=gp, gc=gc, exc=exc, nr=nr))
                if isinstance(exc_syn, dict):
                    # hook may override the LP coefficients used for
                    # the committed chain (true-a diagnostics)
                    a = exc_syn.get("a", a)
                    exc_syn = exc_syn["exc_syn"]
            else:
                code_syn = code
                if self.mode not in ("7k4", "10k2") and nr < 2:
                    rowmap = DISP_ROWMAP.get(self.mode,
                                             DISP_ROWMAP["default"])
                    code_syn = disp_circular(code, rowmap[nr])
                exc_syn = gp * v + gc * code_syn
                if gp > 0.5:
                    # PINNED (probe_emph_law.py, all gain rows, rel2
                    # ~2e-5): low-mode synthesis emphasis factor is
                    # 0.5*gp*min(gp, SHARP_MAX), with the same energy
                    # renorm as MR122 (whose factor is 0.25*gp*min(gp,1)).
                    e0 = float(np.dot(exc_syn, exc_syn))
                    pf = 0.5 * gp * min(gp, SHARP_MAX)
                    e2 = exc_syn + pf * v
                    s2 = float(np.dot(e2, e2))
                    if s2 > 0.0:
                        exc_syn = e2 * np.sqrt(e0 / s2)
            if self.trace is not None:
                self.trace.append(dict(a=a, v=v.copy(), code=code.copy(),
                                       gp=gp, gc=gc, T0=T0, frac=frac,
                                       exc=exc.copy()))
            y = replica.subframe_chain(exc_syn, a, self.st_chain,
                                       **LOW_CHAIN)
            o, self.hp = replica.hp_biquad(
                y, np.array([1.0, -2.0, 1.0]) * HPG, np.asarray(HPP),
                self.hp)
            out[40 * k: 40 * (k + 1)] = o
        self.past_lsp = lsp_new
        return out


def decode(mode, bit_frames, trace=None):
    d = LowDecoder(mode, trace=trace)
    return np.concatenate([d.decode_frame(b) for b in bit_frames])
