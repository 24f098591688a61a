"""Excitation extraction: invert the (known) MR122 decode chain to read
back the per-subframe excitation of any probe stream whose LSF bits are
known, by least-squares fitting the 40 excitation samples per subframe
through the forward chain. Once the excitation is observable, the
adaptive-codebook structure (lag coding, fractional interpolator taps,
sharpening), the gain tables/predictor, and the fixed-codebook position
coding all become DIRECT linear/discrete measurements instead of
probes filtered through the postfilter.

The chain output is nearly linear in exc (synthesis + postfilter are
linear; only the AGC energy ratio is mildly nonlinear), so a warm-started
LS over 40 parameters converges in a few iterations with residuals at
float32 round-off.
"""

from __future__ import annotations

import os
import sys

import numpy as np
from scipy.optimize import least_squares

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import replica  # noqa: E402
from fit_frame import CHAIN, HPG, HPP  # noqa: E402
from refit_bad import hz_to_cos, lsp_to_a, reorder_lsf  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
LEARNED = os.path.join(HERE, "learned", "lsf_mr122.npz")


class ChainInverter:
    """Stateful chain runner: feed per-subframe (a, exc) to advance, or
    fit exc for an observed 40-sample oracle output."""

    def __init__(self):
        self.st = replica.fresh_state()
        self.hp = [0.0] * 4

    def _clone(self):
        st = {k: (v.copy() if hasattr(v, "copy") else v)
              for k, v in self.st.items()}
        return st, list(self.hp)

    def run(self, a, exc):
        y = replica.subframe_chain(np.asarray(exc, float), a, self.st,
                                   **CHAIN)
        out, self.hp = replica.hp_biquad(
            y, np.array([1.0, -2.0, 1.0]) * HPG, np.asarray(HPP), self.hp)
        return out

    def fit_exc(self, a, target, exc0=None, tol=3e-6):
        """Fit the 40 excitation samples reproducing `target`; advances
        the chain state with the fitted excitation. Returns (exc, resid)."""
        target = np.asarray(target, float)
        scale = max(np.abs(target).max(), 1e-12)
        st0, hp0 = self._clone()

        def resid(exc):
            st = {k: (v.copy() if hasattr(v, "copy") else v)
                  for k, v in st0.items()}
            y = replica.subframe_chain(exc, a, st, **CHAIN)
            out, _ = replica.hp_biquad(
                y, np.array([1.0, -2.0, 1.0]) * HPG, np.asarray(HPP),
                list(hp0))
            return (out - target) / scale

        x0 = np.zeros(40) if exc0 is None else np.asarray(exc0, float)
        res = least_squares(resid, x0, xtol=3e-16, ftol=3e-16, max_nfev=400)
        r = float(np.abs(res.fun).max())
        self.run(a, res.x)
        return res.x, r


def mr122_subframe_as(v_groups_per_frame):
    """Per-subframe LP coefficient arrays for a stream of MR122 frames
    given each frame's 5 group values, using the learned tables +
    reorder + 0.5/0.5 cosine interpolation. Returns (n_frames, 4, 10)."""
    z = np.load(LEARNED)
    q1t = [z[f"q1_{g}"] for g in range(5)]
    q2t = [z[f"q2_{g}"] for g in range(5)]
    half_init = z["sf0_w"][0] * z["sf0_init"]
    past = None  # past frame's q2 LSP vector; init memory for frame 1
    out = []
    for vg in v_groups_per_frame:
        q1 = np.concatenate([q1t[g][vg[g]] for g in range(5)])
        q2 = np.concatenate([q2t[g][vg[g]] for g in range(5)])
        l1 = hz_to_cos(reorder_lsf(q1))
        l2 = hz_to_cos(reorder_lsf(q2))
        p = half_init if past is None else 0.5 * past
        lsps = [p + 0.5 * l1, l1, 0.5 * l1 + 0.5 * l2, l2]
        out.append(np.stack([lsp_to_a(np.sort(x)[::-1]) for x in lsps]))
        past = l2
    return np.stack(out)


def extract_stream(pcm, v_groups_per_frame, exc0=None, verbose=False):
    """Fit excitation for every subframe of a decoded probe stream.
    Returns (exc[(n_frames*4), 40], resids)."""
    As = mr122_subframe_as(v_groups_per_frame)
    inv = ChainInverter()
    excs, resids = [], []
    n = 0
    for f in range(As.shape[0]):
        for k in range(4):
            tgt = pcm[40 * n: 40 * (n + 1)]
            w = None if exc0 is None else exc0[n]
            e, r = inv.fit_exc(As[f, k], tgt, exc0=w)
            excs.append(e)
            resids.append(r)
            if verbose:
                print(f"frame {f} sf{k}: resid {r:.2e}", flush=True)
            n += 1
    return np.stack(excs), resids
