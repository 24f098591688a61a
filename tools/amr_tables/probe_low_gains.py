"""Pin the low-mode gain decode: the joint-VQ tables' scale
conventions, the fixed-gain predictor law, and the phase-dispersion row
selection.

Part A (gc ladder + dispersion row, per mode): frame-1 sf0 (no
adaptive, no sharpening, fresh dispersion state) with known pulses;
sweep the gain index; fit exc on {code, conv(code, ir_k)} -> measured
gc (sum of coefficients) and the active dispersion row (argmax |coef|).
gc(g) / gc(g0) is the correction-factor ratio, directly comparable to
the gains tables' Q11 column. The absolute gc(g0) pins the predictor's
initial state + energy-mean application.

Part B (gp ladder): sf1 with an absolute-max... (gp is measured at sf1
with lag pointing at sf0's pulses: the coefficient on v).

Usage: python probe_low_gains.py [mode ...]
Writes learned/low_gain_probes.json.
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
        "6k7": 356, "7k4": 4706, "7k95": 4706, "10k2": 0}


def gc_probe(args):
    """Part A: measured (gc, disp row) for gain index g at frame-1 sf0."""
    mode, g = args
    F = L.fields(mode)
    vals = {("pulse0", 0): RICH[mode], ("p_gain", 0): g}
    for (name, s), bits in F.items():
        if name == "p_lag":
            vals[(name, s)] = (1 << len(bits)) - 1
    if mode == "7k95":
        # g indexes the 5-bit fixed_gain field; pitch gain stays 0
        vals[("p_gain", 0)] = 0
        vals[("fixed_gain", 0)] = g
    pcm = decode_bits(MODE_IDX[mode], [make_frame(mode, vals)])
    ch = LowChain()
    a = all_zero_as(mode, 1)[0]
    exc, r = ch.fit_exc(a, pcm[:40])
    code = L.pulses_mode(mode, 0, RICH[mode], 0)
    cols = [code] + [np.convolve(code, L.IR_FILTERS[k])[:40]
                     for k in range(3)]
    A = np.stack(cols, axis=1)
    x, *_ = np.linalg.lstsq(A, np.asarray(exc), rcond=None)
    fit_r = float(np.linalg.norm(A @ x - exc) / max(np.linalg.norm(exc),
                                                    1e-12))
    gc = float(np.sum(x))
    row = int(np.argmax(np.abs(x)))
    return (f"{mode}|{g}",
            dict(gc=gc, coefs=[float(c) for c in x], disp=row,
                 resid=fit_r, exc_extract_resid=float(r)))


def main():
    modes = sys.argv[1:] or ["4k75", "5k15", "5k9", "6k7", "7k4", "7k95"]
    jobs = []
    for mode in modes:
        F = L.fields(mode)
        nb = len(F[("fixed_gain", 0)] if mode == "7k95"
                 else F[("p_gain", 0)])
        for g in range(1 << nb):
            jobs.append((mode, g))
    print(f"{len(jobs)} gc probes")
    results = {}
    with ProcessPoolExecutor(max_workers=16) as ex:
        for key, out in ex.map(gc_probe, jobs, chunksize=8):
            results[key] = out
    path = os.path.join(HERE, "learned", "low_gain_probes.json")
    json.dump(results, open(path, "w"), indent=0)
    print("saved", path)


if __name__ == "__main__":
    main()
