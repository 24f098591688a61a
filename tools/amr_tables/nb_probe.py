"""Client + Python float-exact mirrors for lavc's AMR-NB float decoder
helpers, probed DIRECTLY from the libavcodec.a objects (fork-isolated
server /tmp/wbdis/nb_probe.c -> nb_probe; source banked as
tools/amr_tables/nb_probe_main.c).

Same route that closed G.729 to bit-exact: fuzz each mirror against the
REAL object code until float-identical, then assemble the full decoder
(nbexact.py) and match lavc's float32 output sample-for-sample.

Rebuild:
  cd /tmp/wbdis && ar x /usr/lib/x86_64-linux-gnu/libavcodec.a \
     acelp_filters.o acelp_vectors.o celp_filters.o celp_math.o \
     acelp_pitch_delay.o lsp.o amrnbdec.o
  gcc -no-pie -O1 -o nb_probe nb_probe.c acelp_filters.o acelp_vectors.o \
     celp_filters.o celp_math.o acelp_pitch_delay.o lsp.o -lm
"""

from __future__ import annotations

import struct
import subprocess

import numpy as np

PROBE = "/tmp/wbdis/nb_probe"

f32 = np.float32
f64 = np.float64


class NB:
    def __init__(self):
        self.p = subprocess.Popen([PROBE], stdin=subprocess.PIPE,
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.DEVNULL)

    def _x(self, msg, n):
        self.p.stdin.write(msg)
        self.p.stdin.flush()
        r = self.p.stdout.read(n)
        assert len(r) == n, f"probe died ({len(r)}/{n})"
        return r

    def lsf2lspd(self, lsf):
        r = self._x(b"a" + np.asarray(lsf, np.float32).tobytes(), 80)
        return np.frombuffer(r, np.float64).copy()

    def lspd2lpc(self, lsp):
        r = self._x(b"b" + np.asarray(lsp, np.float64).tobytes(), 40)
        return np.frombuffer(r, np.float32).copy()

    def set_min_dist_lsf(self, lsf, mind, size=10):
        r = self._x(b"c" + np.asarray(lsf, np.float32).tobytes()
                    + struct.pack("<di", float(mind), size), 40)
        return np.frombuffer(r, np.float32).copy()

    def decode_pitch_lag(self, index, prev_lag_int, subframe,
                         third_as_first, resolution):
        r = self._x(b"d" + struct.pack("<5i", index, prev_lag_int, subframe,
                                       third_as_first, resolution), 8)
        return struct.unpack("<2i", r)

    def interpolatef(self, in200, base_idx, frac, filt_len=10, length=40):
        r = self._x(b"e" + np.asarray(in200, np.float32).tobytes()
                    + struct.pack("<4i", base_idx, frac, filt_len, length),
                    160)
        return np.frombuffer(r, np.float32).copy()

    def decode_10_pulses(self, idx10, gray8, half_pulse_count, bits):
        r = self._x(b"f" + np.asarray(idx10, np.int16).tobytes()
                    + bytes(gray8) + struct.pack("<2i", half_pulse_count,
                                                 bits), 96)
        n, = struct.unpack("<i", r[:4])
        x = np.frombuffer(r[4:44], np.int32).copy()
        y = np.frombuffer(r[44:84], np.float32).copy()
        nrm, lag = struct.unpack("<2i", r[84:92])
        fac, = struct.unpack("<f", r[92:96])
        return dict(n=n, x=x, y=y, no_repeat_mask=nrm, pitch_lag=lag,
                    pitch_fac=fac)

    def set_fixed_vector(self, fx, scale):
        msg = (b"g" + struct.pack("<i", fx["n"])
               + np.asarray(fx["x"], np.int32).tobytes()
               + np.asarray(fx["y"], np.float32).tobytes()
               + struct.pack("<2if", fx["no_repeat_mask"], fx["pitch_lag"],
                             fx["pitch_fac"])
               + struct.pack("<f", scale))
        return np.frombuffer(self._x(msg, 160), np.float32).copy()

    def set_fixed_gain(self, factor, fixed_mean_energy, pred_err4,
                       energy_mean, pred_table5):
        a = np.array([factor, fixed_mean_energy, *pred_err4, energy_mean,
                      *pred_table5], np.float32)
        r = self._x(b"h" + a.tobytes(), 20)
        return (struct.unpack("<f", r[:4])[0],
                np.frombuffer(r[4:], np.float32).copy())

    def scale_to_sos(self, in40, sos):
        r = self._x(b"i" + np.asarray(in40, np.float32).tobytes()
                    + struct.pack("<f", float(sos)), 160)
        return np.frombuffer(r, np.float32).copy()

    def synth_f(self, coeffs10, in40, hist10):
        r = self._x(b"j" + np.asarray(coeffs10, np.float32).tobytes()
                    + np.asarray(in40, np.float32).tobytes()
                    + np.asarray(hist10, np.float32).tobytes(), 160)
        return np.frombuffer(r, np.float32).copy()

    def zero_synth_f(self, coeffs10, in50):
        r = self._x(b"k" + np.asarray(coeffs10, np.float32).tobytes()
                    + np.asarray(in50, np.float32).tobytes(), 160)
        return np.frombuffer(r, np.float32).copy()

    def tilt_compensation(self, mem, tilt, s40):
        r = self._x(b"l" + struct.pack("<2f", float(mem), float(tilt))
                    + np.asarray(s40, np.float32).tobytes(), 164)
        return (struct.unpack("<f", r[:4])[0],
                np.frombuffer(r[4:], np.float32).copy())

    def adaptive_gain_control(self, in40, speech_energ, alpha, gain_mem):
        r = self._x(b"m" + np.asarray(in40, np.float32).tobytes()
                    + struct.pack("<3f", float(speech_energ), float(alpha),
                                  float(gain_mem)), 164)
        return (np.frombuffer(r[:160], np.float32).copy(),
                struct.unpack("<f", r[160:])[0])

    def order2_transfer(self, in160, zeros2, poles2, gain, mem2, n=160):
        r = self._x(b"n" + np.asarray(in160, np.float32).tobytes()
                    + np.asarray(zeros2, np.float32).tobytes()
                    + np.asarray(poles2, np.float32).tobytes()
                    + struct.pack("<f", float(gain))
                    + np.asarray(mem2, np.float32).tobytes()
                    + struct.pack("<i", n), 648)
        return (np.frombuffer(r[:640], np.float32).copy()[:n],
                np.frombuffer(r[640:], np.float32).copy())

    def circ_addf(self, in40, lagged100, lag, fac):
        r = self._x(b"o" + np.asarray(in40, np.float32).tobytes()
                    + np.asarray(lagged100, np.float32).tobytes()
                    + struct.pack("<if", int(lag), float(fac)), 160)
        return np.frombuffer(r, np.float32).copy()

    def weighted_sumf(self, a40, b40, wa, wb):
        r = self._x(b"p" + np.asarray(a40, np.float32).tobytes()
                    + np.asarray(b40, np.float32).tobytes()
                    + struct.pack("<2f", float(wa), float(wb)), 160)
        return np.frombuffer(r, np.float32).copy()


# ==================================================================
# Python float-exact mirrors (validated by the __main__ fuzz)
# ==================================================================

def m_lsf2lspd(lsf):
    """lsp[i] = cos(lsf[i] * 2pi/8000) in double."""
    import math
    lsf = np.asarray(lsf, np.float32)
    out = np.empty(10, np.float64)
    two_pi = np.float64(2.0 * math.pi)   # folded constant 2.0*M_PI
    for i in range(10):
        out[i] = np.cos(two_pi * np.float64(lsf[i]) / np.float64(8000.0))
    return out


def m_lspd2lpc(lsp):
    """ff_acelp_lspd2lpc: double lsp2polyd on even/odd, float out:
    lpc[i] = 0.5*( f1[i+1]+f1[i] + f2[i+1]-f2[i] ) paired."""
    lsp = np.asarray(lsp, np.float64)

    def poly(l):
        f = np.zeros(6, np.float64)
        f[0] = 1.0
        f[1] = -2.0 * l[0]
        for i in range(2, 6):
            val = np.float64(-2.0) * l[i - 1]
            f[i] = val * f[i - 1] + 2.0 * f[i - 2]
            for j in range(i - 1, 1, -1):
                f[j] += f[j - 1] * val + f[j - 2]
            f[1] += val
        return f

    f1 = poly(lsp[0::2])
    f2 = poly(lsp[1::2])
    lpc = np.empty(10, np.float32)
    for i in range(1, 6):
        ff1 = f1[i] + f1[i - 1]
        ff2 = f2[i] - f2[i - 1]
        lpc[i - 1] = np.float32((ff1 + ff2) * 0.5)
        lpc[10 - i] = np.float32((ff1 - ff2) * 0.5)
    return lpc


def m_set_min_dist_lsf(lsf, mind, size=10):
    lsf = np.asarray(lsf, np.float32).copy()
    prev = np.float32(0.0)
    for i in range(size):
        lsf[i] = np.float32(max(np.float64(lsf[i]),
                                np.float64(prev) + np.float64(mind)))
        prev = lsf[i]
    return lsf


def m_interpolatef(in_arr, base, frac, b60, filt_len=10, length=40):
    """out[n] = sum_i in[n+i]*filt[6i+frac] + in[n-1-i]*filt[6(i+1)-frac]
    in float32."""
    in_arr = np.asarray(in_arr, np.float32)
    out = np.empty(length, np.float32)
    for n in range(length):
        v = np.float32(0.0)
        idx = 0
        i = 0
        while i < filt_len:
            v = np.float32(v + in_arr[base + n + i] * b60[idx + frac])
            idx += 6
            i += 1
            v = np.float32(v + in_arr[base + n - i] * b60[idx - frac])
        out[n] = v
    return out


def m_synth_f(coeffs, seq, hist):
    """out[n] = in[n] - sum coeffs[k]*out[n-1-k] in float32."""
    coeffs = np.asarray(coeffs, np.float32)
    out = list(np.asarray(hist, np.float32))
    for x in np.asarray(seq, np.float32):
        v = np.float64(x)
        for k in range(10):
            v -= np.float64(coeffs[k]) * np.float64(out[-1 - k])
        out.append(np.float32(v))
    return np.asarray(out[10:], np.float32)


def m_zero_synth_f(coeffs, seq50):
    """out[n] = in[n] + sum coeffs[k]*in[n-1-k] (FIR) in float32."""
    coeffs = np.asarray(coeffs, np.float32)
    s = np.asarray(seq50, np.float32)
    out = np.empty(40, np.float32)
    for n in range(40):
        v = np.float64(s[10 + n])
        for k in range(10):
            v += np.float64(coeffs[k]) * np.float64(s[10 + n - 1 - k])
        out[n] = np.float32(v)
    return out


if __name__ == "__main__":
    nb = NB()
    rng = np.random.default_rng(0)
    # --- lsf2lspd
    bad = 0
    for _ in range(100):
        lsf = np.sort(rng.uniform(30, 3900, 10)).astype(np.float32)
        if not np.array_equal(m_lsf2lspd(lsf), nb.lsf2lspd(lsf)):
            bad += 1
    print("lsf2lspd", 100 - bad, "/100")
    # --- lspd2lpc
    bad = 0
    for t in range(100):
        lsf = np.sort(rng.uniform(30, 3900, 10)).astype(np.float32)
        lsp = nb.lsf2lspd(lsf)
        ref = nb.lspd2lpc(lsp)
        mine = m_lspd2lpc(lsp)
        if not np.array_equal(mine, ref):
            bad += 1
            if bad <= 2:
                print("  lpc diff", mine[:4], ref[:4])
    print("lspd2lpc", 100 - bad, "/100")
    # --- set_min_dist
    bad = 0
    for _ in range(100):
        lsf = rng.uniform(0, 4000, 10).astype(np.float32)
        if not np.array_equal(m_set_min_dist_lsf(lsf, 50.0488),
                              nb.set_min_dist_lsf(lsf, 50.0488)):
            bad += 1
    print("set_min_dist", 100 - bad, "/100")
    # --- synthesis filters
    bad = 0
    for _ in range(60):
        co = rng.uniform(-1, 1, 10).astype(np.float32)
        seq = rng.uniform(-2000, 2000, 40).astype(np.float32)
        hist = rng.uniform(-2000, 2000, 10).astype(np.float32)
        if not np.array_equal(m_synth_f(co, seq, hist),
                              nb.synth_f(co, seq, hist)):
            bad += 1
    print("synth_f", 60 - bad, "/60")
    bad = 0
    for _ in range(60):
        co = rng.uniform(-1, 1, 10).astype(np.float32)
        seq = rng.uniform(-2000, 2000, 50).astype(np.float32)
        if not np.array_equal(m_zero_synth_f(co, seq),
                              nb.zero_synth_f(co, seq)):
            bad += 1
    print("zero_synth_f", 60 - bad, "/60")
