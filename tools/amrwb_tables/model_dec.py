"""Reference (python) implementation of the recovered AMR-WB 12.65k
decode model — the oracle for debugging native/augment/amrwb.cc.

Model: bits -> ISF (base + delta tables, MA mu) -> per-subframe interp
-> A16; exc = gp*frac_read(hist) + gc*sharpened code; synth 1/A16;
16k output via the P chain map.
"""

from __future__ import annotations

import numpy as np

import isf_lab as L
import isf_param as IP

Z = np.load("/root/repo/tools/amrwb_tables/learned/isf_tables.npz")
CM = np.load("/root/repo/tools/amrwb_tables/learned/chain_maps.npz")
GAIN = np.fromfile(
    "/usr/lib/x86_64-linux-gnu/libavcodec.so.59.37.100",
    np.uint8)[11372064:11372064 + 512].view(np.int16).reshape(128, 2)
FIELDS = L.FIELDS
MU = 0.25
PRED_TAPS = [0.5, 0.4, 0.3, 0.2]
SHARP = 0.85
LAGS = {0: [10, 11, 12, 13, 14, 46, 69, 79, 91],
        1: [36, 49, 72, 77, 83, 98],
        2: [15, 16, 17, 18, 19, 51, 70, 80, 92],
        3: [37, 95, 73, 78, 84, 99]}
GAIN0 = [3, 20, 42, 28, 32, 38, 24]


def get(bits, mp):
    v = 0
    for b in mp:
        v = (v << 1) | bits[b]
    return v


def track_map(sf, t):
    mp = [109 + 4 * sf + t]
    for k in range(4):
        mp += [125 + 32 * k + 8 * t + sf, 129 + 32 * k + 8 * t + sf]
    return mp


def dec_track(v):
    A = sum(((v >> (2 * i)) & 1) << i for i in range(4))
    B = sum(((v >> (2 * i + 1)) & 1) << i for i in range(4))
    s = (v >> 8) & 1
    s1 = 1 if s else -1
    return [(B, s1), (A, s1 if A >= B else -s1)]


def dec_lag_abs(idx):
    if idx < 376:
        T = (idx + 137) >> 2
        return T, idx - (T << 2) + 136
    if idx < 440:
        T = (idx + 257 - 376) >> 1
        return T, (idx - (T << 1) + 256 - 376) * 2
    return idx - 280, 0


def rel_base(T, frac):
    return min(max(T - 8 - (1 if frac < 0 else 0), 34), 216)


def dec_lag_rel(idx, base):
    li = (idx + 1) >> 1
    return li + base, (idx - (li << 1)) * 2


def frac_read(exc, n, T, frac):
    if frac == 0:
        return exc[n - T]
    d = frac * 0.25
    acc = 0.0
    for k in range(-7, 9):
        tau = k - d
        w = 0.54 + 0.46 * np.cos(np.pi * tau / 8.5)
        s = 1.0 if abs(tau) < 1e-9 else np.sin(np.pi * tau) / (np.pi * tau)
        acc += exc[n - T - k] * s * w
    return acc


class Model:
    def __init__(self):
        self.isf_prev = Z["base16"].copy()
        self.delta_prev = np.zeros(16)
        self.exc = np.zeros(231 + 10 + 256)
        self.synth_mem = np.zeros(16)
        self.hist = [0.0] * 4
        self.prev_T, self.prev_frac = 64, 0
        self.s_all = []    # full 12.8k synthesis (for P mapping)

    def gains(self, row):
        gp = GAIN[row][0] / 16384.0
        pred = sum(PRED_TAPS[i] * self.hist[i] for i in range(4))
        gc = (GAIN[row][1] / 441.0) * 10 ** (pred / 20.0)
        return gp, gc

    def push_gain(self, row):
        c = 20.0 * np.log10(GAIN[row][1] / 441.0)
        self.hist = [c] + self.hist[:3]

    def frame(self, bits):
        f = {k: get(bits, FIELDS[k]) for k in FIELDS}
        d = sum(Z[f"delta_{k}"][f[k]] for k in FIELDS)
        isf_new = Z["base16"] + d + MU * self.delta_prev
        self.delta_prev = d
        # within-polynomial ordering fix
        for par in (0, 1):
            lim = 15 if par == 0 else 14
            for i in range(par + 2, lim, 2):
                if isf_new[i] < isf_new[i - 2] + 30.0:
                    isf_new[i] = isf_new[i - 2] + 30.0
        self.exc[:-256] = self.exc[256:]
        e0 = len(self.exc) - 256
        out = np.zeros(256)
        W = [0.45, 0.8, 0.96, 1.0]
        for sf in range(4):
            isf_i = (1 - W[sf]) * self.isf_prev + W[sf] * isf_new
            a = IP.isf_to_a(isf_i)
            if sf in (0, 2):
                T, frac = dec_lag_abs(get(bits, LAGS[sf]))
            else:
                T, frac = dec_lag_rel(get(bits, LAGS[sf]),
                                      rel_base(self.prev_T,
                                               self.prev_frac))
            self.prev_T, self.prev_frac = T, frac
            row = get(bits, [b + sf for b in GAIN0])
            gp, gc = self.gains(row)
            self.push_gain(row)
            code = np.zeros(64)
            for t in range(4):
                for pos, sgn in dec_track(get(bits, track_map(sf, t))):
                    code[4 * pos + t] += sgn
            if T < 64:
                for i in range(T, 64):
                    code[i] += SHARP * code[i - T]
            for n in range(64):
                gi = e0 + sf * 64 + n
                v = frac_read(self.exc, gi, T, frac)
                self.exc[gi] = gp * v + gc * code[n]
            # synthesis
            for n in range(64):
                s = self.exc[e0 + sf * 64 + n]
                for k in range(1, 17):
                    idx = sf * 64 + n - k
                    past = out[idx] if idx >= 0 else self.synth_mem[idx]
                    s -= a[k] * past
                out[sf * 64 + n] = s
            self.synth_mem = out[sf * 64 + 48: sf * 64 + 64].copy()
        self.isf_prev = isf_new.copy()
        self.s_all.extend(out.tolist())
        return out

    def output16k(self):
        s = np.array(self.s_all)
        P = CM["P"]
        nout = int(len(s) / 0.8) - 40
        out = np.zeros(nout)
        for m in range(nout):
            base = int(0.8 * m) - 12
            if base < 0 or base + 33 > len(s):
                continue
            out[m] = P[m % 5] @ s[base: base + 33]
        return out
