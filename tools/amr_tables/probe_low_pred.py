"""Pin the low-mode fixed-gain MA predictor: random gain-index
sequences over frame-1's four subframes (all lags at field max so the
adaptive read stays in zero history), measure gc per subframe via the
circular-dispersion fit, and solve

    20log10(gc_i / (corr_i/2048)) = dot(MA, u_{i-1..i-4}) + MEAN - ecode

for the MA coefficients, the update quantity u (hypothesis: u_i =
20log10(corr_i)), and the initial predictor state.

Frame-1 sf0 measurements already pinned the combined init:
epred_init = -115.37 dB (probe_low_gains.py analysis).
"""

from __future__ import annotations

import json
import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import amrnb_low as L  # noqa: E402
from modes_lab import LowChain, make_frame, MODE_IDX  # noqa: E402
from oracle import decode_bits  # noqa: E402
from probe_low_lags_common import all_zero_as  # noqa: E402

RICH = {"4k75": 60, "5k15": 60, "5k9": (8 << 4) | 12,
        "6k7": 356, "7k4": 4706, "7k95": 4706}


def measure_stream(args):
    """Decode frame(s) with the given per-subframe gain indices and
    measure gc for every subframe."""
    mode, gseq = args
    F = L.fields(mode)
    n_frames = (len(gseq) + 3) // 4
    frames = []
    for f in range(n_frames):
        vals = {}
        for (name, s), bits in F.items():
            if name == "p_lag":
                vals[(name, s)] = (1 << len(bits)) - 1
            elif name == "pulse0":
                vals[(name, s)] = RICH[mode]
        for s in range(4):
            gi = 4 * f + s
            if gi < len(gseq):
                if mode == "7k95":
                    vals[("p_gain", s)] = 0
                    vals[("fixed_gain", s)] = gseq[gi]
                elif mode == "4k75":
                    if s in (0, 2):
                        vals[("p_gain", s)] = gseq[gi]
                else:
                    vals[("p_gain", s)] = gseq[gi]
        frames.append(make_frame(mode, vals))
    pcm = decode_bits(MODE_IDX[mode], frames)
    As = all_zero_as(mode, n_frames)
    ch = LowChain()
    gcs = []
    for k in range(len(gseq)):
        exc, _ = ch.fit_exc(As[k], pcm[40 * k: 40 * (k + 1)])
        code = L.pulses_mode(mode, k % 4, RICH[mode], 0)
        cols = [code] + [L.disp_circular(code, r) for r in range(3)]
        A = np.stack(cols, axis=1)
        x, *_ = np.linalg.lstsq(A, np.asarray(exc), rcond=None)
        resid = float(np.linalg.norm(A @ x - exc)
                      / max(np.linalg.norm(exc), 1e-12))
        gcs.append(dict(gc=float(np.sum(x)), resid=resid,
                        disp=int(np.argmax(np.abs(x)))))
    return f"{mode}|" + ",".join(map(str, gseq)), gcs


def low_gp_indices(mode, nb):
    """Gain indices whose gp is small (adaptive reads stay negligible in
    frame 2 even though the history is nonzero)."""
    if mode in ("5k15", "5k9"):
        T = L.GAINS_LOW
    elif mode in ("6k7", "7k4", "10k2"):
        T = L.GAINS_HIGH
    else:
        return list(range(1 << nb))  # 7k95: gp field separate, stays 0
    return [int(i) for i in np.where(T[:, 0] < 1600)[0]]


def main():
    rng = np.random.default_rng(11)
    jobs = []
    for mode in (sys.argv[1:] or ["5k9", "7k4"]):
        F = L.fields(mode)
        nb = len(F[("fixed_gain", 0)] if mode == "7k95"
                 else F[("p_gain", 0)])
        # frame-1-only streams (zero history -> any gp): pins MA[0..2]
        for _ in range(40):
            gseq = rng.integers(0, 1 << nb, size=4).tolist()
            jobs.append((mode, gseq))
        # two-frame streams restricted to low-gp rows: pins MA[3]
        lo = low_gp_indices(mode, nb)
        for _ in range(16):
            gseq = [int(lo[i]) for i in
                    rng.integers(0, len(lo), size=8)]
            jobs.append((mode, gseq))
    path = os.path.join(HERE, "learned", "low_pred_probes.json")
    results = json.load(open(path)) if os.path.exists(path) else {}
    with ProcessPoolExecutor(max_workers=16) as ex:
        for key, out in ex.map(measure_stream, jobs):
            results[key] = out
    json.dump(results, open(path, "w"), indent=0)
    print("saved", path)


if __name__ == "__main__":
    main()
