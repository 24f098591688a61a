"""Full MR122 (AMR-NB 12.2) decoder replica, assembled from everything
pinned so far:

- decode chain (synthesis -> formant postfilter -> tilt -> AGC -> HP):
  replica.py, frozen constants (FACTS.md), fit resid ~1.8e-6
- LSF split-matrix codebooks + means: learned/lsf_tables_bin.npz
  (scan_lsf4.py, unique binary hits, 3GPP mean_lsf_5 values)
- LSP interpolation (cos domain 0.5/0.5, lsp_init): refit_bad.py fits
- gain tables qua_gain_code[32]/2048 and qua_gain_pitch[16]/16384:
  binary @11347360/11347424, gc ladder behaviorally confirmed
- b60 fractional interpolator: binary float32 @11333056
- 244-bit storage map: FACTS.md

Remaining HYPOTHESES (each exposed as a module constant / flag, pinned
by probe_dec.py oracle comparisons before anything ships):
  H1 lag decode (dec_lag6-style absolute for sf0/2, relative sf1/3)
  H2 code sharpening with CURRENT subframe gp, clipped to [0, SHARP_MAX]
  H3 gc prediction: MA(4) on 20log10(correction), coefs [0.68 .58 .34
     .19], MEAN_ENER 36 dB, init state -14 dB? wait... exposed below
  H4 E_code measured on the SHARPENED code (explains the measured
     decreasing f[gp] saturation ~0.577-0.581)
  H5 LSF MA predictor factor (frame >= 2)
  H6 position/sign bit -> pulse mapping inside each 3-bit field
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import replica  # noqa: E402
from fit_frame import CHAIN, HPG, HPP  # noqa: E402
from refit_bad import hz_to_cos, lsp_to_a, reorder_lsf  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))

# ---------------------------------------------------------------- tables
_z = np.load(os.path.join(HERE, "learned", "lsf_tables_bin.npz"))
LSF_TABLES = [_z[f"table_{g}"].astype(np.float64) / 4.096 for g in range(5)]
MEAN_LSF = np.array([1384, 2077, 3420, 5108, 6742, 8122, 9863, 11092,
                     12714, 13701], np.float64) / 4.096  # Hz
B60 = np.load(os.path.join(HERE, "learned", "b60_sinc.npy"))  # 61 taps
QUA_GAIN_CODE = np.array(
    [159, 206, 268, 349, 419, 482, 554, 637, 733, 842, 969, 1114, 1281,
     1473, 1694, 1948, 2241, 2577, 2963, 3408, 3919, 4507, 5183, 5960,
     6855, 7883, 9065, 10425, 12510, 16263, 21142, 27485],
    np.float64) / 2048.0
# Pitch gain table pinned BEHAVIORALLY (probe_gp.py LS fits on extracted
# oracle excitation matched idx 1..3 to 5e-6; NOT the 3GPP Q14 values —
# the oracle's table sits ~0.55% lower, e.g. idx11 = 16296 not 16384).
QUA_GAIN_PITCH = np.array(
    [0, 3260, 6519, 8146, 9776, 11405, 12221, 13036, 13851, 14666, 15481,
     16296, 17111, 17926, 18742, 19557], np.float64) / 16384.0

# ------------------------------------------------------- bit map (FACTS)
LSF_GROUP_BITS = [
    list(range(0, 7)),
    list(range(7, 15)),
    list(range(15, 24)),
    list(range(24, 29)) + [81, 82, 83],
    list(range(84, 88)) + [120, 121],
]
# Lag fields are BIT-INTERLEAVED in storage order (probe_lag2.py: the
# sf0/sf2 absolute fields alternate over {29..46}; sf1/sf3 relative
# fields alternate over {71..80} + {242,243}). MSB first.
LAG_BITS = [list(range(29, 46, 2)),         # sf0 absolute, 9 bits (odd)
            [71, 73, 75, 77, 79, 242],      # sf1 relative, 6 bits
            list(range(30, 47, 2)),         # sf2 absolute, 9 bits (even)
            [72, 74, 76, 78, 80, 243]]      # sf3 relative, 6 bits
GP_BITS = [[47 + k, 51 + k, 55 + k, 88 + k] for k in range(4)]
GC_BITS = [[59 + k, 63 + k, 67 + k, 92 + k, 104 + k] for k in range(4)]
SIGN_BITS = [[96 + k, 100 + k, 108 + k, 112 + k, 116 + k] for k in range(4)]
POS_BITS = [
    list(range(122, 137)) + list(range(182, 197)),
    list(range(137, 152)) + list(range(197, 212)),
    list(range(152, 167)) + list(range(212, 227)),
    list(range(167, 182)) + list(range(227, 242)),
]

# ------------------------------------------------------ open hypotheses
SHARP_MAX = 1.0          # H2 clip (measured f[gp] saturation ~ 1/sqrt(3))
PRED_MA = np.array([0.68, 0.58, 0.34, 0.19])  # H3
MEAN_ENER = 36.0         # H3 (dB)
ENER_INIT = -14.0        # H3 initial prediction state (dB)
LSF_PRED_FAC = 0.65      # H5
EMPH = True              # H7 pitch-contribution emphasis (synthesis only)
FB_TRUNC = True          # H8 feedback excitation truncation (Q ~ 2/32768)
# H6 PINNED (probe_positions.py, learned/posmap_mr122.json): pulse j's
# 3-bit field = consecutive storage bits POS_BITS[k][3j:3j+3]; block 1 =
# pulses 0..4 (tracks 0..4 first pulse), block 2 = pulses 5..9 (second
# pulse per track). Position value = DGRAY[b0 + 2*b1 + 4*b2] with b0 the
# FIRST transmitted bit (Gray LSB-first), DGRAY the EFR decode table.
DGRAY = [0, 1, 3, 2, 5, 6, 4, 7]
# H1 significance: bits listed MSB-first.


def field(bits, positions):
    v = 0
    for b in positions:
        v = (v << 1) | bits[b]
    return v


def dec_lag6_abs(index):
    """H1 (PINNED for index 0 by sharpening-echo observation: T0=17,
    frac=+3): absolute decode T0 = (index+5)//6 + 17, frac in -2..3,
    then integer lags for index >= 463."""
    if index < 463:
        T0 = (index + 5) // 6 + 17
        frac = index - 6 * (T0 - 17) + 3
    else:
        T0 = index - 368
        frac = 0
    return T0, frac


def dec_lag6_rel(index, T0_prev):
    """H1 (PINNED by probe_exc2: first-divergent subframes were always
    sf1/sf3 and off by exactly one integer lag): relative decode around
    the previous subframe integer lag, T0 = T0_min + (index+5)//6 - 1,
    frac = index - 6*((index+5)//6) + 3, T0_min = clip(T0_prev-5,
    [18, 134]). index=0 encodes T0_min-1 with frac +3 (= T0_min - 0.5)."""
    T0_min = max(T0_prev - 5, 18)
    if T0_min > 134:
        T0_min = 134
    i = (index + 5) // 6
    T0 = T0_min + i - 1
    frac = index - 6 * i + 3
    return T0, frac


def pred_lt_6(exc_hist, T0, frac, n=40):
    """Adaptive codebook vector by 6-phase b60 interpolation of the past
    excitation. exc_hist: history array, index -1 = last sample of the
    previous subframe. Returns v[0..n-1] and uses exc_hist in-place
    convention of 3GPP (interpolation may read "future" history built
    recursively for lags < 40)."""
    # 3GPP Pred_lt_3or6: frac in -3..2 -> frac = -frac; if frac < 0:
    # frac += 6, T0 += 1
    frac = -frac
    t0 = T0
    if frac < 0:
        frac += 6
        t0 += 1
    v = np.empty(n)
    L = len(exc_hist)
    buf = np.concatenate([exc_hist, v])  # recursive reads for T0 < n
    for i in range(n):
        s = 0.0
        for k in range(10):
            s += buf[L + i - t0 - k] * B60[frac + 6 * k]
            s += buf[L + i - t0 + 1 + k] * B60[6 - frac + 6 * k]
        buf[L + i] = s
        v[i] = s
    return v


def decode_positions(pos_field_vals, sign_vals):
    """H6 (pinned): 10 pulses of +-1 on tracks i%5; position = track +
    5*DGRAY[val] with val read LSB-first from storage. Sign bit s_i
    covers track i's pair: first pulse sign = +(s=0)/-(s=1), second
    pulse same sign if pos2 >= pos1 else opposite (probe-verified)."""
    code = np.zeros(40)
    pos = [t + 5 * DGRAY[v]
           for t, v in zip(list(range(5)) * 2, pos_field_vals)]
    for i in range(5):
        s = -1.0 if sign_vals[i] else 1.0
        p0, p1 = pos[i], pos[i + 5]
        code[p0] += s
        code[p1] += s if p1 >= p0 else -s
    return code


class MR122Decoder:
    def __init__(self, trace=None):
        self.trace = trace  # optional list collecting per-subframe internals
        self.st = replica.fresh_state()
        self.hp = [0.0] * 4
        self.past_lsp = None           # previous frame's q2 LSP (cos)
        self.past_r = np.zeros(10)     # LSF MA predictor state (Hz)
        self.exc_hist = np.zeros(154)  # PIT_MAX + interp margin
        self.ener_pred = [ENER_INIT] * 4  # dB, newest first
        self.gp_prev = 0.0   # previous subframe's pitch gain (sharpening)
        self.T0_prev = 18

    def lsf_decode(self, bits):
        rows = [field(bits, g) for g in LSF_GROUP_BITS]
        r1 = np.empty(10)
        r2 = np.empty(10)
        for g in range(5):
            v = rows[g]
            if g == 2:
                sgn = -1.0 if (v >> 8) & 1 else 1.0
                row = LSF_TABLES[g][v & 0xFF] * sgn
            else:
                row = LSF_TABLES[g][v]
            r1[2 * g: 2 * g + 2] = row[:2]
            r2[2 * g: 2 * g + 2] = row[2:]
        base = MEAN_LSF + LSF_PRED_FAC * self.past_r
        lsf1 = reorder_lsf(base + r1)
        lsf2 = reorder_lsf(base + r2)
        self.past_r = r2  # H5: predictor driven by the 2nd set's residual
        return lsf1, lsf2

    def decode_frame(self, bits):
        bits = list(bits)
        lsf1, lsf2 = self.lsf_decode(bits)
        l1, l2 = hz_to_cos(lsf1), hz_to_cos(lsf2)
        if self.past_lsp is None:
            init = np.array([30000, 26000, 21000, 15000, 8000, 0, -8000,
                             -15000, -21000, -26000]) / 32768.0
            self.past_lsp = init
        lsps = [0.5 * self.past_lsp + 0.5 * l1, l1,
                0.5 * l1 + 0.5 * l2, l2]
        self.past_lsp = l2
        out = np.empty(160)
        for k in range(4):
            a = lsp_to_a(np.sort(lsps[k])[::-1])
            lag_idx = field(bits, LAG_BITS[k])
            if k in (0, 2):
                T0, frac = dec_lag6_abs(lag_idx)
            else:
                T0, frac = dec_lag6_rel(lag_idx, self.T0_prev)
            self.T0_prev = T0
            v = pred_lt_6(self.exc_hist, T0, frac)
            gp = QUA_GAIN_PITCH[field(bits, GP_BITS[k])]
            pos_vals = [field(bits, POS_BITS[k][3 * j: 3 * j + 3][::-1])
                        for j in range(10)]
            sgn_vals = [bits[b] for b in SIGN_BITS[k]]
            code = decode_positions(pos_vals, sgn_vals)
            # sharpening uses the CURRENT subframe's pitch gain clipped to
            # 1.0 (probe_sharp.py: gc scales exactly 1/sqrt(1+beta^2) with
            # beta = min(gp, 1.0), incl. frame-1 sf0)
            sharp = min(gp, SHARP_MAX)
            if T0 < 40:
                for n in range(T0, 40):
                    code[n] += sharp * code[n - T0]
            ecode_db = 10.0 * np.log10(np.dot(code, code) / 40.0)
            epred = float(np.dot(PRED_MA, self.ener_pred))
            gc0 = 10.0 ** (0.05 * (epred + MEAN_ENER - ecode_db))
            gc_idx = field(bits, GC_BITS[k])
            # /16384: pinned by the all-zero oracle match (frame-1 scale
            # was exactly 2.0 against /32768)
            gc = gc0 * QUA_GAIN_CODE[gc_idx] / 16384.0
            self.ener_pred = [20.0 * np.log10(QUA_GAIN_CODE[gc_idx])] \
                + self.ener_pred[:3]
            exc = gp * v + gc * code
            # feedback history: PLAIN excitation (no emphasis/smoothing),
            # TRUNCATED toward zero at the oracle's internal integer scale
            # of 2/32768 output units (pinned by the amplitude sweep in
            # the lag anomaly hunt: trunc step 2.000 LSB minimizes the
            # whole-sweep error with a sharp optimum; small pulses below
            # 1 internal unit vanish from the adaptive history entirely)
            fb = np.trunc(exc * 16384.0) / 16384.0 if FB_TRUNC else exc
            self.exc_hist = np.concatenate([self.exc_hist[40:], fb])
            exc_syn = exc
            if EMPH and gp > 0.5:
                e0 = float(np.dot(exc, exc))
                pf = gp * 0.25 * min(gp, 1.0)
                e2 = exc + pf * v
                s2 = float(np.dot(e2, e2))
                if s2 > 0.0:
                    exc_syn = e2 * np.sqrt(e0 / s2)
            if self.trace is not None:
                self.trace.append(dict(
                    a=a, v=v, code=code, gp=gp, gc=gc, T0=T0, frac=frac,
                    exc=exc, exc_syn=exc_syn, lag_idx=lag_idx,
                    gp_idx=field(bits, GP_BITS[k]), gc_idx=gc_idx))
            y = replica.subframe_chain(exc_syn, a, self.st, **CHAIN)
            o, self.hp = replica.hp_biquad(
                y, np.array([1.0, -2.0, 1.0]) * HPG, np.asarray(HPP),
                self.hp)
            out[40 * k: 40 * (k + 1)] = o
        return out


def decode(bit_frames):
    d = MR122Decoder()
    return np.concatenate([d.decode_frame(b) for b in bit_frames])
