"""Float-exact AMR-NB MR122 decoder vs the in-image lavc `amrnb`
decoder (sample-exact float32 target — the G.729 closure route).

Everything here is pinned by one of:
- direct probes of the libavcodec.a float helpers (nb_probe.py fuzz:
  synthesis filter 60/60, set_fixed_gain variant, lsf2lspd, lspd2lpc,
  min-dist, tilt, AGC, order-2 transfer, weighted sum, circ add);
- tables extracted BY SYMBOL from amrnbdec.o .rodata
  (learned/lavc_amrnb_rodata.npz + the cst4/cst8 constant pools);
- AMRContext introspection fits (prev_lsf_r int16@+0x78 raw residual,
  prev_lsp_sub4 double[10]@+0x180 matched 10/10 EXACT, lsf_q
  float[4][10]@+0x220, pitch_vector@+0x6a0, fixed_vector@+0x740,
  prediction_error@+0x7e0, pitch_gain[5]@+0x7f0, fixed_gain[5]@+0x804,
  postfilter_mem@+0x828);
- the amrnbdec.o disassembly (synthesis: weighted sum + >0.5 emphasis
  with DOUBLE pitch-factor math + scale-to-energy; overflow redo with
  pitch_vector *= 0.25 in ctx).
"""

from __future__ import annotations

import ctypes
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import amrnb_dec as AD  # 244-bit layout (behaviorally validated)

F = np.float32
D = np.float64

_libm = ctypes.CDLL("libm.so.6")
_libm.exp2.restype = ctypes.c_double
_libm.exp2.argtypes = [ctypes.c_double]
_libm.log10f.restype = ctypes.c_float
_libm.log10f.argtypes = [ctypes.c_float]

HERE = os.path.dirname(os.path.abspath(__file__))
T = np.load(os.path.join(HERE, "learned", "lavc_amrnb_rodata.npz"))
B60 = np.load(os.path.join(HERE, "learned", "lavc_b60_sinc.npy"))

LSF5 = [np.frombuffer(T[f"lsf_5_{i}"].tobytes(), np.int16).reshape(-1, 4)
        for i in range(1, 6)]
QUA_GAIN_PIT = np.frombuffer(T["qua_gain_pit"].tobytes(), np.uint16)[:16]
QUA_GAIN_CODE = np.frombuffer(T["qua_gain_code"].tobytes(), np.uint16)[:32]
MEAN_HZ = np.array([337.8909912109375, 507.0799865722656,
                    834.9609985351562, 1247.0699462890625, 1646.0,
                    1982.9100341796875, 2407.9599609375,
                    2708.010009765625, 3104.0, 3344.969970703125], D)
ENERGY_PRED_FAC = np.frombuffer(T["energy_pred_fac"].tobytes(),
                                np.float32)[:4]
ENERGY_MEAN_12K2 = F(36.0)
HP_ZEROS = np.array([-2.0, 1.0], F)
HP_POLES = np.frombuffer(T["highpass_poles"].tobytes(), np.float32)[:2]
HP_GAIN_SCALED = F(5.736202e-05)          # highpass_gain * 2/32768 (cst4)
LSP_SUB4_INIT = np.frombuffer(T["lsp_sub4_init"].tobytes(),
                              np.int8)[:10]
LSP_AVG_INIT = np.frombuffer(T["lsp_avg_init"].tobytes(), np.int16)[:10]
SHARP_MAX = F(0.7944946)
# lavc formant-postfilter gamma tables (acelp_vectors.o .rodata: decimal
# LITERALS, e.g. 0.75^4 is stored as float(0.316406) not 0.31640625 —
# iterative products do NOT reproduce them).
POW_0_7 = np.array([0.699999988079071, 0.49000000953674316,
                    0.34299999475479126, 0.24009999632835388,
                    0.1680700033903122, 0.11764899641275406,
                    0.08235400170087814, 0.05764799937605858,
                    0.04035399854183197, 0.028248000890016556], F)
POW_0_75 = np.array([0.75, 0.5625, 0.421875, 0.3164060115814209,
                     0.23730500042438507, 0.1779790073633194,
                     0.13348400592803955, 0.10011299699544907,
                     0.07508499920368195, 0.056313998997211456], F)
POW_0_55 = np.array([0.550000011920929, 0.30250000953674316,
                     0.16637499630451202, 0.0915059968829155,
                     0.050328001379966736, 0.027681000530719757,
                     0.015224000439047813, 0.008372999727725983,
                     0.004604999907314777, 0.002532999962568283], F)

LP = 10
SF = 40
EXC_OFF = 143 + LP + 1     # excitation index in excitation_buf (= 154,
                           # lavc: excitation_buf[PIT_MAX+LP+1+40] with
                           # p->excitation = buf+154; confirmed by the
                           # ctx scan at priv byte 912)


def exp2d(x):
    return D(_libm.exp2(ctypes.c_double(float(x))))


def log10f(x):
    return F(_libm.log10f(ctypes.c_float(float(x))))


def dotf(a, b, n=None):
    if n is None:
        n = len(a)
    s = F(0.0)
    for i in range(n):
        s = F(s + F(F(a[i]) * F(b[i])))
    return s


def synth_f(coeffs, seq, hist):
    """ff_celp_lp_synthesis_filterf EXACT (probe 60/60)."""
    co = np.asarray(coeffs, F)
    inn = np.asarray(seq, F)
    length = len(inn)
    out = np.concatenate([np.asarray(hist, F)[-10:], np.zeros(length, F)])
    O = 10
    a = co[0]
    b = F(co[1] - F(co[0] * co[0]))
    c = F(F(co[2] - F(co[1] * co[0])) - F(co[0] * b))
    oo0, oo1, oo2, oo3 = out[O - 4], out[O - 3], out[O - 2], out[O - 1]
    n = 0
    base = O
    while n <= length - 4:
        o0, o1, o2, o3 = inn[n], inn[n + 1], inn[n + 2], inn[n + 3]
        o0 = F(o0 - F(co[2] * oo1))
        o1 = F(o1 - F(co[2] * oo2))
        o2 = F(o2 - F(co[2] * oo3))
        o0 = F(o0 - F(co[1] * oo2))
        o1 = F(o1 - F(co[1] * oo3))
        o0 = F(o0 - F(co[0] * oo3))
        val = co[3]
        o0 = F(o0 - F(val * oo0))
        o1 = F(o1 - F(val * oo1))
        o2 = F(o2 - F(val * oo2))
        o3 = F(o3 - F(val * oo3))
        i = 5
        while i <= 10:
            oo3 = out[base - i]
            val = co[i - 1]
            o0 = F(o0 - F(val * oo3))
            o1 = F(o1 - F(val * oo0))
            o2 = F(o2 - F(val * oo1))
            o3 = F(o3 - F(val * oo2))
            oo2 = out[base - i - 1]
            val = co[i]
            o0 = F(o0 - F(val * oo2))
            o1 = F(o1 - F(val * oo3))
            o2 = F(o2 - F(val * oo0))
            o3 = F(o3 - F(val * oo1))
            oo0, oo2 = oo2, oo0
            oo1 = oo3
            i += 2
        t0, t1, t2 = o0, o1, o2
        o3 = F(o3 - F(a * t2))
        o2 = F(o2 - F(a * t1))
        o1 = F(o1 - F(a * t0))
        o3 = F(o3 - F(b * t1))
        o2 = F(o2 - F(b * t0))
        o3 = F(o3 - F(c * t0))
        out[base], out[base + 1] = o0, o1
        out[base + 2], out[base + 3] = o2, o3
        oo0, oo1, oo2, oo3 = o0, o1, o2, o3
        base += 4
        n += 4
    while n < length:
        s = F(inn[n])
        for i in range(1, 11):
            s = F(s - F(co[i - 1] * out[O + n - i]))
        out[O + n] = s
        n += 1
    return out[O:O + length]


def zero_synth_f(coeffs, hist10, seq):
    co = np.asarray(coeffs, F)
    s = np.concatenate([np.asarray(hist10, F), np.asarray(seq, F)])
    out = np.empty(len(seq), F)
    for n in range(len(seq)):
        v = s[10 + n]
        for i in range(1, 11):
            v = F(v + F(co[i - 1] * s[10 + n - i]))
        out[n] = v
    return out


def interpolatef(in_arr, base, frac, filt_len=10, length=40):
    in_arr = np.asarray(in_arr, F)
    out = np.empty(length, F)
    for n in range(length):
        v = F(0.0)
        idx = 0
        i = 0
        while i < filt_len:
            v = F(v + F(in_arr[base + n + i] * B60[idx + frac]))
            idx += 6
            i += 1
            v = F(v + F(in_arr[base + n - i] * B60[idx - frac]))
        out[n] = v
    return out


class NBExact:
    def __init__(self):
        self.prev_lsf_r = np.zeros(10, np.int64)
        # lsp_sub4_init is an int8 table [30,26,21,15,8,0,-8,-15,-21,-26]
        # scaled by 1000/2^15 (pinned by inverting frame-0 sub-0 LPC from
        # the nb_hook speech-energy capture: implied cos values match
        # v*1000/32768 to the lstsq noise floor).
        self.prev_lsp_sub4 = np.array(
            [D(int(v)) * D(1000.0) * D(3.0517578125e-05)
             for v in LSP_SUB4_INIT], D)
        self.lsf_avg = np.array(
            [F(D(int(v)) * D(3.0517578125e-05)) for v in LSP_AVG_INIT], F)
        self.lsf_q = np.zeros((4, 10), F)
        self.excitation_buf = np.zeros(EXC_OFF + SF, F)
        self.pitch_gain = np.zeros(5, F)
        self.fixed_gain = np.zeros(5, F)
        # MIN_ENERGY = -14 dB: pinned by the nb_hook.c capture (the
        # len-4 pred dots of frame 0 read [-14,-14,-14,-14]).
        self.prediction_error = np.full(4, F(-14.0), F)
        self.pitch_lag_int = 0
        self.samples_in = np.zeros(LP + SF, F)
        self.postfilter_mem = np.zeros(10, F)
        self.tilt_mem = F(0.0)
        self.postfilter_agc = F(0.0)
        self.high_pass_mem = np.zeros(2, F)
        self.diff_count = 0
        self.hang_count = 0
        self.prev_sparse_fixed_gain = F(0.0)
        self.prev_ir_filter_nr = 0
        self.ir_filter_onset = 0
        self.beta = F(0.0)

    # ---- LSF / LSP -------------------------------------------------
    def _resid(self, rows):
        q1 = np.zeros(10, np.int64)
        q2 = np.zeros(10, np.int64)
        for g in range(5):
            v = rows[g]
            if g == 2:
                sgn = -1 if (v >> 8) & 1 else 1
                row = LSF5[g][v & 0xFF].astype(np.int64) * sgn
            else:
                row = LSF5[g][v].astype(np.int64)
            q1[2 * g:2 * g + 2] = row[:2]
            q2[2 * g:2 * g + 2] = row[2:]
        return q1, q2

    def _lsf_set(self, q):
        """Introspection-EXACT (prev_lsp_sub4 doubles matched 10/10)."""
        lsf = np.empty(10, F)
        for i in range(10):
            no_r = F(D(0.65) * (D(int(self.prev_lsf_r[i]))
                                * D(0.244140625)) + MEAN_HZ[i])
            lsf[i] = F(D(no_r) * D(0.000125)
                       + D(int(q[i])) * D(3.0517578125e-05))
        prev = F(0.0)
        for i in range(10):
            lsf[i] = F(max(D(lsf[i]), D(prev) + D(0.0062561)))
            prev = lsf[i]
        return lsf

    @staticmethod
    def _lsf2lspd(lsf):
        two_pi = D(2.0 * math.pi)
        return np.array([np.cos(two_pi * D(x)) for x in lsf], D)

    @staticmethod
    def _lspd2lpc(lsp):
        lsp = np.asarray(lsp, D)

        def poly(l):
            f = np.zeros(6, D)
            f[0] = 1.0
            f[1] = -2.0 * l[0]
            for i in range(2, 6):
                val = D(-2.0) * l[i - 1]
                f[i] = val * f[i - 1] + 2.0 * f[i - 2]
                for j in range(i - 1, 1, -1):
                    f[j] += f[j - 1] * val + f[j - 2]
                f[1] += val
            return f

        f1 = poly(lsp[0::2])
        f2 = poly(lsp[1::2])
        lpc = np.empty(10, F)
        for i in range(1, 6):
            ff1 = f1[i] + f1[i - 1]
            ff2 = f2[i] - f2[i - 1]
            lpc[i - 1] = F((ff1 + ff2) * 0.5)
            lpc[10 - i] = F((ff1 - ff2) * 0.5)
        return lpc

    # ---- pitch -----------------------------------------------------
    @staticmethod
    def _dec_lag6(index, prev, subframe):
        if subframe in (0, 2):
            if index < 463:
                lag_int = (index + 107) * 10923 >> 16
                lag_frac = index - lag_int * 6 + 105
            else:
                lag_int = index - 368
                lag_frac = 0
        else:
            lag_int = ((index + 5) * 10923 >> 16) - 1
            lag_frac = index - lag_int * 6 - 3
            lag_int += min(max(prev - 5, 18), 143 - 9)
        return lag_int, lag_frac

    def _pitch_vector(self, lag_index, subframe):
        lag_int, lag_frac = self._dec_lag6(lag_index, self.pitch_lag_int,
                                           subframe)
        self.pitch_lag_int = lag_int
        # lavc decode_pitch_vector: lag_int += frac>0 and frac_pos =
        # frac + 6 - 6*(frac>0) passed to ff_acelp_interpolatef
        # IN-PLACE on the excitation head: for lags < ~49 the forward
        # taps read freshly written outputs (recursive interpolation).
        fp = lag_frac + 6 - 6 * (lag_frac > 0)
        lag_int += lag_frac > 0
        exc = self.excitation_buf
        base = EXC_OFF + 1 - lag_int
        for n in range(SF):
            v = F(0.0)
            idx = 0
            i = 0
            while i < 10:
                v = F(v + F(exc[base + n + i] * B60[idx + fp]))
                idx += 6
                i += 1
                v = F(v + F(exc[base + n - i] * B60[idx - fp]))
            exc[EXC_OFF + n] = v
        return exc[EXC_OFF:EXC_OFF + SF].copy()

    # ---- fixed vector ----------------------------------------------
    def _pulses(self, bits, k):
        pos_vals = [AD.field(bits, AD.POS_BITS[k][3 * j:3 * j + 3][::-1])
                    for j in range(10)]
        sgn_vals = [bits[b] for b in AD.SIGN_BITS[k]]
        x = []
        y = []
        for i in range(5):
            s = F(-1.0) if sgn_vals[i] else F(1.0)
            p0 = i + 5 * AD.DGRAY[pos_vals[i]]
            p1 = i + 5 * AD.DGRAY[pos_vals[i + 5]]
            x.append(p0)
            y.append(s)
            x.append(p1)
            y.append(F(s) if p1 >= p0 else F(-s))
        return x, y

    def _set_fixed_vector(self, out, x, y, scale, pitch_lag, pitch_fac):
        """ff_set_fixed_vector: in-loop pitch repetition per pulse."""
        for xi, yi in zip(x, y):
            fac = F(yi * scale)
            pos = xi
            while pos < SF:
                out[pos] = F(out[pos] + fac)
                fac = F(fac * pitch_fac)
                pos += pitch_lag
        return out

    # ---- frame -----------------------------------------------------
    def frame(self, bits, probe=None):
        bits = list(bits)
        rows = [AD.field(bits, g) for g in AD.LSF_GROUP_BITS]
        q1, q2 = self._resid(rows)
        lsf1 = self._lsf_set(q1)
        lsf2 = self._lsf_set(q2)
        self.prev_lsf_r = q2
        lsp1 = self._lsf2lspd(lsf1)
        lsp2 = self._lsf2lspd(lsf2)
        # lsf_q quarter updates (gain smoothing state; set order 1 then 2)
        for lsf_new in (lsf1, lsf2):
            for i in range(4):
                wa = F(D(0.25) * D(3 - i))
                wb = F(D(0.25) * D(i + 1))
                for j in range(10):
                    self.lsf_q[i][j] = F(F(wa * self.lsf_q[i][j])
                                         + F(wb * lsf_new[j]))
        lsps = [0.5 * self.prev_lsp_sub4 + 0.5 * lsp1, lsp1,
                0.5 * lsp1 + 0.5 * lsp2, lsp2]
        self.prev_lsp_sub4 = lsp2.copy()
        out = np.empty(160, F)
        for k in range(4):
            lpc = self._lspd2lpc(lsps[k])
            self._pitch_vector(AD.field(bits, AD.LAG_BITS[k]), k)
            exc = self.excitation_buf
            pitch_vector = exc[EXC_OFF:EXC_OFF + SF].copy()
            gp_idx = AD.field(bits, AD.GP_BITS[k])
            gc_idx = AD.field(bits, AD.GC_BITS[k])
            self.pitch_gain[4] = F(D(int(QUA_GAIN_PIT[gp_idx]))
                                   * D(6.103515625e-05))
            fixed_gain_factor = F(D(int(QUA_GAIN_CODE[gc_idx]))
                                  * D(0.00048828125))
            self.beta = F(min(self.pitch_gain[4], F(1.0)))
            x, y = self._pulses(bits, k)
            fixed_vector = self._set_fixed_vector(
                np.zeros(SF, F), x, y, F(1.0), self.pitch_lag_int,
                self.beta)
            fme = F(dotf(fixed_vector, fixed_vector) / F(SF))
            dp = dotf(ENERGY_PRED_FAC, self.prediction_error, 4)
            arg = D(math.log2(10)) * (D(0.05)
                                      * D(F(dp + ENERGY_MEAN_12K2)))
            self.fixed_gain[4] = F(D(fixed_gain_factor) * exp2d(arg)
                                   / D(np.sqrt(fme)))
            self.prediction_error = np.concatenate(
                [self.prediction_error[1:],
                 [F(D(20.0) * D(log10f(fixed_gain_factor)))]]).astype(F)
            # feedback excitation with truncf
            for i in range(SF):
                exc[EXC_OFF + i] = F(exc[EXC_OFF + i] * self.pitch_gain[4])
            self._set_fixed_vector(exc[EXC_OFF:], x, y,
                                   self.fixed_gain[4],
                                   self.pitch_lag_int, self.beta)
            for i in range(SF):
                exc[EXC_OFF + i] = F(np.trunc(exc[EXC_OFF + i]))
            fixed_gain = self.fixed_gain[4]   # smoothing off for 12.2
            samples = self._synthesis(lpc, fixed_gain, fixed_vector,
                                      pitch_vector, False)
            if samples is None:
                samples = self._synthesis(lpc, fixed_gain, fixed_vector,
                                          pitch_vector, True)
            self.samples_in[LP:] = samples
            out[40 * k:40 * (k + 1)] = self._postfilter(lpc)
            if probe is not None:
                probe.append(dict(lpc=lpc.copy(),
                                  pv=pitch_vector.copy(),
                                  fv=fixed_vector.copy(),
                                  gp=F(self.pitch_gain[4]),
                                  gc=F(self.fixed_gain[4]),
                                  exc=exc[EXC_OFF:EXC_OFF + SF].copy(),
                                  samples=samples.copy()))
            self._update_state()
        ob = np.empty(160, F)
        m0, m1 = self.high_pass_mem
        for i in range(160):
            tmp = F(F(F(HP_GAIN_SCALED * out[i]) - F(HP_POLES[0] * m0))
                    - F(HP_POLES[1] * m1))
            ob[i] = F(F(tmp + F(HP_ZEROS[0] * m0)) + F(HP_ZEROS[1] * m1))
            m1 = m0
            m0 = tmp
        self.high_pass_mem[0] = m0
        self.high_pass_mem[1] = m1
        return ob

    def _synthesis(self, lpc, fixed_gain, fixed_vector, pitch_vector,
                   overflow):
        exc = self.excitation_buf
        if overflow:
            pv = exc[EXC_OFF - SF:EXC_OFF]    # NOTE: ctx pitch_vector
            # (separate array); our copy:
            pv = pitch_vector
            for i in range(SF):
                pv[i] = F(pv[i] * F(0.25))
        pv = pitch_vector
        excitation = np.empty(SF, F)
        for i in range(SF):
            excitation[i] = F(F(self.pitch_gain[4] * pv[i])
                              + F(fixed_gain * fixed_vector[i]))
        if self.pitch_gain[4] > F(0.5) and not overflow:
            energy = dotf(excitation, excitation)
            # 12.2: pitch_factor = (float)((double)gp * (0.25 *
            #        (double)min(gp, 1.0)))  [synthesis asm 1ef path]
            gpd = D(self.pitch_gain[4])
            pf = F(gpd * (D(0.25) * D(F(min(self.pitch_gain[4],
                                            F(1.0))))))
            for i in range(SF):
                excitation[i] = F(excitation[i] + F(pf * pv[i]))
            sf2 = dotf(excitation, excitation)
            scale = F(1.0)
            if sf2 != 0:
                scale = F(np.sqrt(F(energy / sf2)))
            for i in range(SF):
                excitation[i] = F(excitation[i] * scale)
        samples = synth_f(lpc, excitation, self.samples_in[:LP])
        if not overflow:
            for v in samples:
                if abs(float(v)) > 32768.0:
                    return None
        return samples

    def _postfilter(self, lpc):
        samples = self.samples_in[LP:]
        speech_gain = dotf(samples, samples)
        lpc_n = np.empty(10, F)
        lpc_d = np.empty(10, F)
        for i in range(10):
            lpc_n[i] = F(lpc[i] * POW_0_7[i])
            lpc_d[i] = F(lpc[i] * POW_0_75[i])
        pole_out = synth_f(lpc_d, samples, self.postfilter_mem)
        new_mem = pole_out[-10:].copy()
        # tilt factor
        hf_in = np.zeros(22, F)
        hf_in[0] = F(1.0)
        hf_in[1:11] = lpc_n
        hf = synth_f(lpc_d, hf_in, np.zeros(10, F))
        rh0 = dotf(hf, hf, 22)
        rh1 = dotf(hf, hf[1:], 21)
        tilt = (F(D(F(rh1 / rh0)) * D(0.8))   # x0.8 in DOUBLE (asm 1a8d)
                if rh1 >= 0.0 else F(0.0))
        # Order pinned by the nb_hook AGC-input capture: pole filter ->
        # zero filter -> ff_tilt_compensation ON buf_out -> AGC (the
        # earlier tilt-on-pole_out order exploded from subframe 2 on).
        buf = zero_synth_f(lpc_n, self.postfilter_mem, pole_out)
        self.postfilter_mem = new_mem
        ntm = buf[SF - 1]
        for i in range(SF - 1, 0, -1):
            buf[i] = F(buf[i] - F(tilt * buf[i - 1]))
        buf[0] = F(buf[0] - F(tilt * self.tilt_mem))
        self.tilt_mem = ntm
        pe = dotf(buf, buf)
        gsf = F(1.0)
        if pe != 0:
            gsf = F(np.sqrt(F(speech_gain / pe)))
        gsf = F(gsf * F(F(1.0) - F(0.9)))
        mem = self.postfilter_agc
        outb = np.empty(SF, F)
        for i in range(SF):
            mem = F(F(F(0.9) * mem) + gsf)
            outb[i] = F(buf[i] * mem)
        self.postfilter_agc = mem
        return outb

    def _update_state(self):
        eb = self.excitation_buf
        eb[:EXC_OFF] = eb[SF:SF + EXC_OFF]
        self.pitch_gain[:4] = self.pitch_gain[1:]
        self.fixed_gain[:4] = self.fixed_gain[1:]
        self.samples_in[:LP] = self.samples_in[SF:SF + LP]


def decode(bit_frames):
    d = NBExact()
    return np.concatenate([d.frame(b) for b in bit_frames])
