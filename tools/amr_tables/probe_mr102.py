"""MR102 (10k2) fixed-codebook sweep: decode frame-1 probes with every
value of each position field (pulse4/pulse5: 10 bits, pulse6: 7 bits)
and every sign combo (pulse0..3), extract the sf0 excitation via the
exact all-zero-LSF LP fit, and save the raw excitations for analysis
(fit_mr102.py pins the smoothing kernel + position maps).

Contamination control as in probe_low_pulses.py: max lag indices, the
minimum-gp row of gains_high.
"""

from __future__ import annotations

import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import amrnb_low as L  # noqa: E402
from modes_lab import LowChain, make_frame, MODE_IDX  # noqa: E402
from oracle import decode_bits  # noqa: E402
from probe_low_zero import frame1_a  # noqa: E402

MODE = "10k2"
SF = 0


def base_vals():
    F = L.fields(MODE)
    g = int(np.argmin(L.GAINS_HIGH[:, 0]))
    vals = {}
    for (name, sf), bits in F.items():
        if name == "p_lag":
            vals[(name, sf)] = (1 << len(bits)) - 1
        elif name == "p_gain":
            vals[(name, sf)] = g
    return vals


def probe_one(args):
    fname, v = args
    vals = base_vals()
    if fname == "signs":
        for k in range(4):
            vals[(f"pulse{k}", SF)] = (v >> k) & 1
    else:
        vals[(fname, SF)] = v
    pcm = decode_bits(MODE_IDX[MODE], [make_frame(MODE, vals)])
    ch = LowChain()
    a = frame1_a(MODE, SF)
    exc, r = ch.fit_exc(a, pcm[40 * SF: 40 * (SF + 1)])
    return (fname, v), np.asarray(exc, np.float64), float(r)


def main():
    jobs = [("signs", v) for v in range(16)]
    jobs += [("pulse4", v) for v in range(1024)]
    jobs += [("pulse5", v) for v in range(1024)]
    jobs += [("pulse6", v) for v in range(128)]
    print(f"{len(jobs)} probes")
    keys, excs, resids = [], [], []
    with ProcessPoolExecutor(max_workers=16) as ex:
        for (key, exc, r) in ex.map(probe_one, jobs, chunksize=8):
            keys.append(f"{key[0]}|{key[1]}")
            excs.append(exc)
            resids.append(r)
    np.savez_compressed(
        os.path.join(HERE, "learned", "mr102_sweep.npz"),
        keys=np.array(keys), exc=np.array(excs),
        resid=np.array(resids))
    print("saved", len(keys), "max resid", max(resids))


if __name__ == "__main__":
    main()
