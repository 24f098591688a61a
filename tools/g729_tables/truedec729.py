"""Fixed-point G.729 (8 kbps) decoder model against the in-image lavc
`g729` decoder — round-5 campaign (FACTS.md). Laws from the g729dec.o/
lsp.o/acelp_*.o disassembly; tables from learned/lavc_g729_tables.npz
(extract route documented in FACTS).  Validated stage by stage via
ctypes context introspection (chan ctx: exc_base@+0x0 (154+80 int16),
exc@+0x134, qpast bufs@+0x1e4 (ring via ptrs@+0x248), lsp@+0x284/298,
quant_energy@+0x2c0, gain_pitch@+0x350, gain_code@+0x35c,
pitch_int_prev@+0x1e0, ma_predictor_prev@+0x370).

__main__ probes:  python truedec729.py lsp|exc|pitch
"""

from __future__ import annotations

import sys

import numpy as np

import oracle
import pf_exact as pe

T = np.load("learned/lavc_g729_tables.npz")

SF = 40

FIELDS = [("L0", 1), ("L1", 7), ("L2", 5), ("L3", 5),
          ("P1", 8), ("P0", 1), ("C1", 13), ("S1", 4),
          ("GA1", 3), ("GB1", 4),
          ("P2", 5), ("C2", 13), ("S2", 4), ("GA2", 3), ("GB2", 4)]


def parse(bits):
    out, p = {}, 0
    for name, n in FIELDS:
        v = 0
        for i in range(n):
            v = (v << 1) | bits[p + i]
        out[name] = v
        p += n
    return out


def build(fields):
    bits, p = [0] * 80, 0
    for name, n in FIELDS:
        v = fields.get(name, 0)
        for i in range(n):
            bits[p + i] = (v >> (n - 1 - i)) & 1
        p += n
    if "P0" not in fields:          # keep the parity valid by default
        P1 = fields.get("P1", 0)
        x = parity(P1)
        off = 1 + 7 + 5 + 5 + 8
        bits[off] = x
    return bits


def parity(P1):
    """P0 = even parity over the 6 MSBs of P1 XOR 1 (ITU G.729)."""
    x = 1
    for b in range(2, 8):
        x ^= (P1 >> b) & 1
    return x


def sat16(v):
    return np.clip(v, -32768, 32767)


def log2_q15(v):
    """ff_log2_q15 exact (celp_math.o asm)."""
    v = int(v)
    msb = max((v | 1).bit_length() - 1, 0)
    norm = (v << (31 - msb)) & 0xFFFFFFFF
    ind = (norm >> 26) & 0x1F
    mant = (norm >> 11) & 0x7FFF
    tab = T["tab_log2"].astype(np.int64)
    return (msb << 15) + int(tab[ind]) + (((int(tab[ind + 1]) -
                                            int(tab[ind])) * mant) >> 15)


class G729Decoder:
    def __init__(self):
        init = np.array([2339, 4679, 7018, 9358, 11698, 14037, 16377,
                         18717, 21056, 23396], np.int64)
        self.qpast = [init.copy() for _ in range(4)]
        self.lsp_old = np.array([30000, 26000, 21000, 15000, 8000, 0,
                                 -8000, -15000, -21000, -26000], np.int64)
        self.exc = np.zeros(154 + 2 * SF, np.int64)
        self.eoff = 154
        self.quant_energy = np.full(4, -14336, np.int64)
        self.gain_pitch = 0          # Q14
        self.gain_code = 0           # Q1 (decode_gain_code >> 12 result)
        self.pitch_prev = 20
        self.synth_mem = np.zeros(10, np.int64)
        self.hpf_f = [0, 0]
        self.hpf_x = [0, 0]
        # exact fixed-point postfilter state (pf_exact, probe-validated)
        self.x_residual = np.zeros(192, np.int64)
        self.x_rfd = [0] * 10
        self.x_pfd = [0] * 50
        self.x_ht_prev = 0
        self.x_voicing = 0
        self.x_agc = 0x4000   # decoder_init: ctx+0x53c = 0x4000

    # ---------------- LSF / LSP / LP -------------------------------
    def lsf_decode(self, L0, L1, L2, L3):
        q = np.empty(10, np.int64)
        q[:5] = T["cb_lsp_1st"][L1][:5].astype(np.int64) + \
            T["cb_lsp_2nd"][L2][:5]
        q[5:] = T["cb_lsp_1st"][L1][5:].astype(np.int64) + \
            T["cb_lsp_2nd"][L3][5:]
        for gap in (10, 5):
            for i in range(1, 10):
                d = q[i - 1] - q[i] + gap
                if d > 0:
                    # both halves truncate (d >> 1); an odd overlap keeps
                    # the pair 1 closer than `gap` (lavc g729dec behavior,
                    # fit against ctx qpast introspection)
                    q[i - 1] -= d >> 1
                    q[i] += d >> 1
        ma = T["cb_ma_predictor"][L0].astype(np.int64)
        s = T["cb_ma_predictor_sum"][L0].astype(np.int64)
        lsf = (s * q + sum(ma[k] * self.qpast[k] for k in range(4))) >> 15
        self.qpast = [q.copy()] + self.qpast[:3]
        # ff_acelp_reorder_lsf(lsf, 321, 40, 25681, 10)
        lsf = np.sort(np.asarray(lsf, np.int64))
        mn = 40
        for i in range(10):
            lsf[i] = max(lsf[i], mn)
            mn = lsf[i] + 321
        lsf[9] = min(lsf[9], 25681)
        return lsf

    @staticmethod
    def lsf2lsp(lsf):
        tc = T["tab_cos"].astype(np.int64)
        out = np.empty(10, np.int64)
        for i in range(10):
            x = (int(lsf[i]) * 20861) >> 15
            ind, off = (x >> 8) & 0xFF, x & 0xFF
            out[i] = tc[ind] + ((off * (tc[ind + 1] - tc[ind])) >> 8)
        return out

    @staticmethod
    def lsp2lp(lsp):
        """ff_acelp_lsp2lpc exact (lsp.o: lsp2poly Q22/Q24 ints)."""
        def lsp2poly(l):
            # f[] are int32 in lavc (wrapping); MULL = 64-bit mul >> 14
            # truncated to int32
            f = [0] * 6
            f[0] = 1 << 22
            f[1] = -int(l[0]) << 8
            for i in range(2, 6):
                f[i] = f[i - 2]
                for j in range(i, 1, -1):
                    f[j] = pe.wrap32(
                        f[j] + f[j - 2]
                        - pe.wrap32((int(l[i - 1]) * f[j - 1]) >> 14))
                f[1] = pe.wrap32(f[1] - (int(l[i - 1]) << 8))
            return f
        f1 = lsp2poly(lsp[0::2])
        f2 = lsp2poly(lsp[1::2])
        lp = np.empty(11, np.int64)
        lp[0] = 4096
        for i in range(1, 6):
            ff1 = pe.wrap32(f1[i] + f1[i - 1] + (1 << 10))
            ff2 = pe.wrap32(f2[i] - f2[i - 1])
            lp[i] = pe.wrap16(pe.wrap32(ff1 + ff2) >> 11)
            lp[11 - i] = pe.wrap16(pe.wrap32(ff1 - ff2) >> 11)
        return lp

    # ---------------- pitch ----------------------------------------
    @staticmethod
    def dec_pitch_abs(P1):
        """ITU G.729 3.7: first-subframe absolute delay (1/3 units)."""
        if P1 < 197:
            return P1 + 58
        return 3 * (P1 - 112)

    @staticmethod
    def dec_pitch_rel(P2, prev_int):
        """second subframe: d3 = 3*clip(prev-5, 20, 134) - 2 + P2
        (asm fc2-ff5)."""
        t_min = min(max(prev_int - 5, 20), 134)
        return 3 * t_min - 2 + P2

    def adaptive(self, d3, n0):
        """ff_acelp_interpolate(precision=6, frac*2, filt_len=10)."""
        pitch_int = d3 // 3
        frac = (d3 - 3 * pitch_int) * 2
        filt = T["interp_filter"].astype(np.int64)
        base = self.eoff + n0
        for n in range(SF):
            v = 0x4000
            idx = 0
            i = 0
            p = base + n - pitch_int
            while i < 10:
                v += self.exc[p + i] * filt[idx + frac]
                idx += 6
                i += 1
                v += self.exc[p - i] * filt[idx - frac]
            self.exc[base + n] = int(sat16(v >> 15))
        return pitch_int

    # ---------------- fixed codebook -------------------------------
    @staticmethod
    def fixed_vector(C, S):
        """ff_acelp_fc_pulse_per_track exact: Q13 pulses, sign bit 1
        -> +8191, 0 -> -8192; tracks13[idx]+track for 3 tracks, then
        track4 table."""
        fc = np.zeros(SF, np.int64)
        t13 = T["fc_4p_tracks13"].astype(int)
        t4 = T["fc_4p_track4"].astype(int)
        idx, sgn = C, S
        for tr in range(3):
            pos = t13[idx & 7] + tr
            fc[pos] += 8191 if (sgn & 1) else -8192
            idx >>= 3
            sgn >>= 1
        fc[t4[idx & 0xF]] += 8191 if (sgn & 1) else -8192
        return fc

    def sharpen(self, fc, pitch_int):
        """fc[i] += clip(prev gain_pitch, [3277,13017])*fc[i-T] >> 14
        for i >= T (ff_acelp_weighted_vector_sum, round 0, shift 14,
        weight_a 0x4000)."""
        if pitch_int < SF:
            gp = min(max(self.gain_pitch, 3277), 13017)
            for i in range(pitch_int, SF):
                fc[i] = int(sat16((0x4000 * fc[i] +
                                   gp * fc[i - pitch_int]) >> 14))
        return fc

    # ---------------- gains ----------------------------------------
    def gains(self, GA, GB, fc):
        g1 = T["cb_gain_1st_8k"].astype(np.int64)
        g2 = T["cb_gain_2nd_8k"].astype(np.int64)
        self.gain_pitch = int(g1[GA][0] + g2[GB][0])
        factor = int(g1[GA][1] + g2[GB][1])
        # ff_acelp_decode_gain_code: the exact double expression is
        # gain_corr_factor * exp(M_LN10/(20<<23) * mr_energy)
        #   / sqrt(dot(fc, fc)), truncated to int, >> 12 — replicate the
        # operation ORDER bit-for-bit (a different association changes
        # the double rounding and flips borderline truncations)
        import math
        ene = (1018156 << 10) + int(np.sum(
            self.quant_energy * T["ma_prediction_coeff"].astype(np.int64)))
        c1 = math.log(10.0) / float(20 << 23)
        val = factor * math.exp(c1 * ene) / math.sqrt(float(np.dot(fc, fc)))
        self.gain_code = int(val) >> 12
        # ff_acelp_update_past_gain(quant_energy, factor, log2n=2, 0):
        # q0 = (6165*((ff_log2(factor)>>2) - (13<<13))) >> 13
        # (the earlier *8 ... - 0x39110000 >> 16 form was a fit that
        # wraps for factor >~ 1743 — this is the true expression)
        self.quant_energy[1:] = self.quant_energy[:3]
        self.quant_energy[0] = \
            (6165 * ((log2_q15(factor) >> 2) - (13 << 13))) >> 13

    # ---------------- output chain ---------------------------------
    def hpf(self, x):
        """ff_acelp_high_pass_filter exact (acelp_filters.o asm)."""
        out = np.empty(len(x), np.int64)
        f0, f1 = self.hpf_f
        xm1, xm2 = self.hpf_x
        for i in range(len(x)):
            d = int(x[i]) - 2 * xm1 + xm2
            tmp = 7699 * d
            tmp += (f0 * 15836) >> 13
            tmp += (f1 * -7667) >> 13
            out[i] = int(sat16((tmp + 0x800) >> 12))
            xm2, xm1 = xm1, int(x[i])
            f1, f0 = f0, tmp
        self.hpf_f = [f0, f1]
        self.hpf_x = [xm1, xm2]
        return out

    # ---------------- frame ----------------------------------------
    def frame(self, bits, trace=None):
        f = parse(bits)
        lsf = self.lsf_decode(f["L0"], f["L1"], f["L2"], f["L3"])
        lsp = self.lsf2lsp(lsf)
        lsp1 = (self.lsp_old + lsp) >> 1
        lps = [self.lsp2lp(lsp1), self.lsp2lp(lsp)]
        self.lsp_old = lsp
        self.exc[:self.eoff] = self.exc[2 * SF:self.eoff + 2 * SF]
        out = np.zeros(2 * SF, np.int64)      # RAW synthesis (lavc keeps
        final = np.zeros(2 * SF, np.int64)    # it for filter memories)
        self.x_voicing = 0                    # per-frame reset (asm 0x19d)
        for sf in range(2):
            if sf == 0:
                d3 = self.dec_pitch_abs(f["P1"])
            else:
                d3 = self.dec_pitch_rel(f["P2"], self.pitch_prev)
            pitch_int = self.adaptive(d3, sf * SF)
            if sf == 0:
                pf_pitch = (d3 + 1) // 3   # postfilter uses the FIRST
                # subframe's rounded int pitch for BOTH subframes
                # (fit against ctx pfd/ht_prev introspection at f6-sf2)
            # rounded int: tracking prev AND sharpening/postfilter
            # (the earlier truncation finding was an artifact of the
            # +59-vs-+58 abs-law bug; echo probes P1=81/82/140)
            self.pitch_prev = (d3 + 1) // 3
            pitch_round = (d3 + 1) // 3
            fc = self.fixed_vector(f[f"C{sf+1}"], f[f"S{sf+1}"])
            fc = self.sharpen(fc, pitch_round)
            self.gains(f[f"GA{sf+1}"], f[f"GB{sf+1}"], fc)
            e0 = self.eoff + sf * SF
            for n in range(SF):
                v = (self.gain_pitch * self.exc[e0 + n] +
                     self.gain_code * fc[n] + 0x2000) >> 14
                self.exc[e0 + n] = int(sat16(v))
            # synthesis (ff_celp_lp_synthesis_filter, Q12 lp,
            # rounding 0x800, saturating)
            a = lps[sf]

            def synth(detect):
                """One ff_celp_lp_synthesis_filter pass; returns True on
                int16 overflow when detect (the decode_frame TRIAL call,
                stop_on_overflow=1, asm ba8)."""
                for n in range(SF):
                    v = 0x800
                    for k in range(1, 11):
                        past = (out[sf * SF + n - k]
                                if n - k + sf * SF >= 0
                                else self.synth_mem[10 + n - k]
                                if sf == 0 else out[SF + n - k])
                        v -= a[k] * past
                    # int32-wrapping accumulator; in[n] added after >> 12
                    # (ff_celp_lp_synthesis_filter asm 5c8-62e)
                    s = (pe.wrap32(v) >> 12) + int(self.exc[e0 + n])
                    if detect and not (-32768 <= s <= 32767):
                        return True
                    out[sf * SF + n] = int(sat16(s))
                return False

            if synth(detect=True):
                # overflow in the trial synthesis: the ENTIRE exc_base
                # (154 history + 80 current) is >>2'd in place and the
                # subframe is re-synthesized (decode_frame asm 1272-128d)
                self.exc >>= 2
                synth(detect=False)
            if sf == 1:
                self.synth_mem = out[-10:].copy()
            sp = out[sf * SF:(sf + 1) * SF]
            # exact output chain: ff_g729_postfilter -> AGC -> HPF
            # (fuzz-validated vs the real object code; see pf_exact.py)
            spl = [int(v) for v in sp]
            gain_before = sum(pe.abs16u(v) for v in spl)
            self.x_voicing, self.x_ht_prev = pe.postfilter(
                pf_pitch, self.x_voicing, self.x_ht_prev, a,
                self.x_residual, self.x_rfd, self.x_pfd, spl)
            gain_after = sum(pe.abs16u(v) for v in spl)
            self.x_agc = pe.adaptive_gain_control(
                gain_before, gain_after, spl, self.x_agc)
            final[sf * SF:(sf + 1) * SF] = self.hpf(
                np.asarray(spl, np.int64))
        if trace is not None:
            trace["exc"] = self.exc[self.eoff:self.eoff + 80].copy()
        return final


def lavc_ctx_decode(frames):
    """Decode on lavc and return (pcm, peek) with ctx readers."""
    import ctypes as C
    d = oracle.Decoder("g729", 8000)
    priv = C.cast(C.c_void_p(d.ctx + 0x20),
                  C.POINTER(C.c_void_p)).contents.value
    chan = C.cast(C.c_void_p(priv + 0x18),
                  C.POINTER(C.c_void_p)).contents.value

    def i16(off, n):
        return np.frombuffer(C.string_at(chan + off, 2 * n),
                             np.int16).copy()
    outs = [d.decode(oracle.pack_frame(b)) for b in frames]
    return np.concatenate(outs), i16


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "exc"
    rng = np.random.default_rng(0)
    if what == "lsp":
        for _ in range(6):
            f = {"L0": int(rng.integers(0, 2)),
                 "L1": int(rng.integers(0, 128)),
                 "L2": int(rng.integers(0, 32)),
                 "L3": int(rng.integers(0, 32))}
            _, peek = lavc_ctx_decode([build(f)])
            ref = peek(0x298, 10)
            d = G729Decoder()
            lsp = d.lsf2lsp(d.lsf_decode(f["L0"], f["L1"], f["L2"],
                                         f["L3"]))
            ok = np.array_equal(lsp, ref.astype(np.int64))
            print("lsp", "OK" if ok else f"MISMATCH {lsp} vs {ref}")
    elif what == "exc":
        for trial in range(4):
            frames = []
            for _ in range(2):
                f = {"L0": int(rng.integers(0, 2)),
                     "L1": int(rng.integers(0, 128)),
                     "L2": int(rng.integers(0, 32)),
                     "L3": int(rng.integers(0, 32)),
                     "P1": int(rng.integers(0, 256)),
                     "C1": int(rng.integers(0, 1 << 13)),
                     "S1": int(rng.integers(0, 16)),
                     "GA1": int(rng.integers(0, 8)),
                     "GB1": int(rng.integers(0, 16)),
                     "P2": int(rng.integers(0, 32)),
                     "C2": int(rng.integers(0, 1 << 13)),
                     "S2": int(rng.integers(0, 16)),
                     "GA2": int(rng.integers(0, 8)),
                     "GB2": int(rng.integers(0, 16))}
                frames.append(build(f))
            _, peek = lavc_ctx_decode(frames)
            ref_exc = peek(0x134, 80).astype(np.int64)
            d = G729Decoder()
            tr = {}
            for b in frames:
                tr = {}
                d.frame(b, trace=tr)
            mine = tr["exc"]
            err = np.abs(mine - ref_exc)
            print(f"trial {trial}: exc maxerr {err.max()} "
                  f"rms {np.sqrt((ref_exc.astype(float)**2).mean()):.0f} "
                  f"match {np.mean(err == 0)*100:.0f}%")
