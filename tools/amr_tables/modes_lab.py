"""Shared lab machinery for the non-MR122 AMR-NB modes.

Pinned so far (this file's probes + gamma scan):
- low-mode postfilter gammas (0.55, 0.7); tilt 0.8*k1 unclamped; AGC
  alpha 0.9; same output HP biquad as MR122 (fit resid ~1e-6)
- scalar-gain mode 7k95 shares qua_gain_code (exact ladder match) and
  its all-zero 4-pulse code is plain impulses at (0,1,2,3)
- joint gain VQ tables confirmed against the binary: gains_MR475
  [256][4] = (gp_sf Q14, gc_corr Q11) x 2 half-frame subframes at
  byte 11345248; gains_high[128][2] @11344736 (modes 6k7/7k4/10k2);
  gains_low[64][2] @11344480 (5k15/5k9)
- fixed-code sharpening uses the PREVIOUS subframe's pitch gain
  (dead in frame-1 sf1 even at gp index 15)

Core tool: with every LSF field zero, the per-subframe LP sets of an
N-frame stream depend only on the (fixed) LSF decode, so they can be
fitted once from the all-zero stream and reused to LINEARLY extract
the excitation of any probe stream that keeps LSF bits zero — lags,
pulses, gains, sharpening and dispersion then become direct
measurements (same trick as extract_exc.py for MR122).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
from scipy.optimize import least_squares

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import replica  # noqa: E402
from fit_frame import HPG, HPP  # noqa: E402
from oracle import decode_bits, NB_BITS  # noqa: E402

LOW_CHAIN = dict(gn=0.55, gd=0.7, tilt_fac=0.8, tilt_clamp=False,
                 agc_alpha=0.9)
LIB = "/usr/lib/x86_64-linux-gnu/libavcodec.so.59.37.100"

_order = json.load(open(os.path.join(HERE, "learned", "order_maps.json")))
MODE_IDX = {"4k75": 0, "5k15": 1, "5k9": 2, "6k7": 3, "7k4": 4,
            "7k95": 5, "10k2": 6, "12k2": 7}


def fields(mode_name):
    return {(f["name"], f["subframe"]): f["bits"] for f in _order[mode_name]}


def make_frame(mode_name, vals):
    F = fields(mode_name)
    b = [0] * NB_BITS[MODE_IDX[mode_name]]
    for key, v in vals.items():
        bits = F[key]
        for i, pos in enumerate(bits):
            b[pos] = (v >> (len(bits) - 1 - i)) & 1
    return b


def binary_tables():
    data = open(LIB, "rb").read()
    return dict(
        gains_MR475=np.frombuffer(
            data[11345248:11345248 + 2048], np.int16).reshape(256, 4),
        gains_high=np.frombuffer(
            data[11344736:11344736 + 512], np.int16).reshape(128, 2),
        gains_low=np.frombuffer(
            data[11344480:11344480 + 256], np.int16).reshape(64, 2),
        ir_filters=[np.frombuffer(
            data[11344000 + 160 * k:11344000 + 160 * (k + 1)],
            np.float32).astype(float) for k in range(3)],
        energy_mean=np.frombuffer(
            data[11347328:11347360], np.float32).astype(float),
        qua_gain_pitch_q14=np.frombuffer(
            data[11347424:11347456], np.int16).astype(float) / 16384.0,
    )


class LowChain:
    """Stateful low-mode decode chain (synthesis->postfilter->HP)."""

    def __init__(self):
        self.st = replica.fresh_state()
        self.hp = [0.0] * 4

    def clone(self):
        st = {k: (v.copy() if hasattr(v, "copy") else v)
              for k, v in self.st.items()}
        return st, list(self.hp)

    def run(self, a, exc):
        y = replica.subframe_chain(np.asarray(exc, float), a, self.st,
                                   **LOW_CHAIN)
        out, self.hp = replica.hp_biquad(
            y, np.array([1.0, -2.0, 1.0]) * HPG, np.asarray(HPP), self.hp)
        return out

    def fit_exc(self, a, target, exc0=None):
        target = np.asarray(target, float)
        scale = max(np.abs(target).max(), 1e-12)
        st0, hp0 = self.clone()

        def resid(exc):
            st = {k: (v.copy() if hasattr(v, "copy") else v)
                  for k, v in st0.items()}
            y = replica.subframe_chain(exc, a, st, **LOW_CHAIN)
            out, _ = replica.hp_biquad(
                y, np.array([1.0, -2.0, 1.0]) * HPG, np.asarray(HPP),
                list(hp0))
            return (out - target) / scale

        x0 = np.zeros(40) if exc0 is None else np.asarray(exc0, float)
        res = least_squares(resid, x0, xtol=3e-16, ftol=3e-16, max_nfev=400)
        self.run(a, res.x)
        return res.x, float(np.abs(res.fun).max())

    def fit_a_gc(self, target, code, a0=None, gc0=1e-4):
        """Fit (a, gc) for one subframe whose exc = gc*code; advances."""
        target = np.asarray(target, float)
        scale = max(np.abs(target).max(), 1e-12)
        st0, hp0 = self.clone()

        def run_p(p, st, hp):
            y = replica.subframe_chain(p[10] * code, p[:10], st, **LOW_CHAIN)
            return replica.hp_biquad(
                y, np.array([1.0, -2.0, 1.0]) * HPG, np.asarray(HPP), hp)

        def resid(p):
            st = {k: (v.copy() if hasattr(v, "copy") else v)
                  for k, v in st0.items()}
            out, _ = run_p(p, st, list(hp0))
            return (out - target) / scale

        x0 = np.concatenate([np.zeros(10) if a0 is None else a0, [gc0]])
        res = least_squares(resid, x0, xtol=3e-16, ftol=3e-16, max_nfev=600)
        self.run(res.x[:10], res.x[10] * code)
        return res.x[:10], res.x[10], float(np.abs(res.fun).max())


# all-zero fixed-code pulse patterns per mode (pinned by gamma-scan fits
# + the 5k15 blind separation fit; verified by base-fit residual at use
# time). 5k15's all-zero code is NEGATIVE impulses at (0,2).
def zero_code(mode_name):
    c = np.zeros(40)
    if mode_name == "5k15":
        c[[0, 2]] = -1.0
        return c
    npulse = {"4k75": 2, "5k9": 2, "6k7": 3, "7k4": 4,
              "7k95": 4, "10k2": 8}[mode_name]
    c[np.arange(npulse)] = 1.0
    return c


class ModeLab:
    """Cached all-zero-stream LP fits + linear excitation extraction
    for one mode. Valid for probe streams whose LSF fields stay zero."""

    def __init__(self, mode_name, n_frames=3):
        self.mode = mode_name
        self.mi = MODE_IDX[mode_name]
        self.n_frames = n_frames
        self._as = None

    def base_as(self):
        """(n_frames*4, 10) LP sets fitted from the all-zero stream."""
        if self._as is not None:
            return self._as
        cache = os.path.join(HERE, "learned",
                             f"base_as_{self.mode}_{self.n_frames}.npy")
        if os.path.exists(cache):
            self._as = np.load(cache)
            return self._as
        pcm = decode_bits(self.mi, [make_frame(self.mode, {})] *
                          self.n_frames)
        ch = LowChain()
        code = zero_code(self.mode)
        As = []
        a0 = None
        for k in range(4 * self.n_frames):
            a, gc, r = ch.fit_a_gc(pcm[40 * k:40 * (k + 1)], code, a0=a0)
            assert r < 1e-4, (self.mode, k, r)
            As.append(a)
            a0 = a
        self._as = np.stack(As)
        np.save(cache, self._as)
        return self._as

    def read_exc(self, frames_vals, warm=None):
        """Decode a probe stream (list of field-dicts, LSF fields must
        be absent/zero) and extract per-subframe excitation."""
        As = self.base_as()
        frames = [make_frame(self.mode, v) for v in frames_vals]
        pcm = decode_bits(self.mi, frames)
        ch = LowChain()
        excs, resids = [], []
        for k in range(4 * len(frames)):
            e, r = ch.fit_exc(As[k], pcm[40 * k:40 * (k + 1)],
                              exc0=None if warm is None else warm[k])
            excs.append(e)
            resids.append(r)
        return np.stack(excs), resids
