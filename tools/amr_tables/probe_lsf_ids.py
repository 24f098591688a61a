"""Identification probes for the MR122 LSF split-matrix codebooks.

For each of the 5 SMQ index groups, decode a handful of single-index
probes in frame 1 (all other bits zero) and fit per-subframe (a, gc)
with fit_frame.fit_frame1. In frame 1 the LSF predictor memory is zero,
so the fitted subframe-2 LSFs equal mean + codebook columns (0,1) and
subframe-4 LSFs equal mean + columns (2,3) of the selected row — row
DIFFERENCES vs row 0 are therefore measured exactly, which is enough to
identify each table in the lavc binary (scan_lsf.py) without sweeping
all 1216 values.

Output: learned/probe_lsf_ids.npz with per-(group, value) LSF fits.
"""

import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sweep_lsf import GROUPS  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "learned")

# Probe values per group: single bits + a few composites (LSB-side dense
# to catch row-pair structure), always including the MSB row.
def probe_values(nbits):
    vals = {1, 2, 3, 4, 5, 8, 16}
    vals |= {1 << (nbits - 1), (1 << (nbits - 1)) + 1, (1 << nbits) - 1}
    return sorted(v for v in vals if v < (1 << nbits))


_ctx = {}


def _init():
    from oracle import decode_bits, NB_BITS
    from fit_frame import fit_frame1, a_to_lsf
    xf = np.load("/tmp/chain_frozen.npy")
    base = np.load("/tmp/frame1_base.npy")  # (4,10) a + (4,) gc from fit
    _ctx.update(decode_bits=decode_bits, NB=NB_BITS[7],
                fit_frame1=fit_frame1, a_to_lsf=a_to_lsf,
                a_base=base[:, :10], gc_base=base[:, 10])


def run_one(task):
    gi, v = task
    if not _ctx:
        _init()
    rng = np.random.default_rng(hash((gi, v)) & 0xFFFF)
    bits = [0] * _ctx["NB"]
    g = GROUPS[gi]
    for j, b in enumerate(g):
        if (v >> (len(g) - 1 - j)) & 1:
            bits[b] = 1
    pcm = _ctx["decode_bits"](7, [bits])[:160].astype(np.float64)
    best = None
    a0 = _ctx["a_base"].copy()
    for attempt in range(6):
        A, GC, R = _ctx["fit_frame1"](pcm, a0, _ctx["gc_base"])
        r = max(R)
        if best is None or r < best[2]:
            best = (A, GC, r)
        if r < 5e-5:
            break
        a0 = _ctx["a_base"] + rng.normal(0, 0.03 * (attempt + 1),
                                         _ctx["a_base"].shape)
    A, GC, r = best
    lsf = np.full((4, 10), np.nan)
    for k in range(4):
        try:
            lsf[k] = _ctx["a_to_lsf"](A[k])
        except AssertionError:
            pass
    return gi, v, lsf, GC, r


def main():
    tasks = [(gi, v) for gi in range(5) for v in probe_values(len(GROUPS[gi]))]
    tasks.insert(0, (0, 0))  # baseline
    res = {}
    with ProcessPoolExecutor(max_workers=8) as ex:
        for gi, v, lsf, gc, r in ex.map(run_one, tasks):
            res[(gi, v)] = (lsf, gc, r)
            flag = "" if r < 1e-4 else "  <-- POOR FIT"
            print(f"g{gi} v{v:4d} resid {r:.2e}{flag}", flush=True)
    os.makedirs(OUT, exist_ok=True)
    np.savez(os.path.join(OUT, "probe_lsf_ids.npz"),
             keys=np.array([list(k) for k in res]),
             lsf=np.stack([res[k][0] for k in res]),
             gc=np.stack([res[k][1] for k in res]),
             resid=np.array([res[k][2] for k in res]))
    print("saved", os.path.join(OUT, "probe_lsf_ids.npz"))


if __name__ == "__main__":
    main()
