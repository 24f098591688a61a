"""Bulk MR122 LSF codebook sweep: probe every value of each of the 5 SMQ
indices in frame 1, fit the full frame (fit_frame.fit_frame1), and store
per-subframe LSFs. Analysis (solve for mean/init/interpolation weights and
the codebook residuals) happens offline on the saved npz.

Index groups (bit positions in the 244-bit MR122 storage order), from the
moved-coefficient clustering:
  idx1 (lsf 0,1): bits 0..6      (7 bits)
  idx2 (lsf 2,3): bits 7..14     (8 bits)
  idx3 (lsf 4,5): bits 15..23    (9 bits)
  idx4 (lsf 6,7): bits 24..28,81,82,83 (8 bits)
  idx5 (lsf 8,9): bits 84..87,120,121  (6 bits)
"""

import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GROUPS = [
    list(range(0, 7)),
    list(range(7, 15)),
    list(range(15, 24)),
    list(range(24, 29)) + [81, 82, 83],
    list(range(84, 88)) + [120, 121],
]

_ctx = {}


def _init():
    from oracle import decode_bits, NB_BITS  # noqa: F401
    from fit_frame import fit_frame1, a_to_lsf
    xf = np.load("/tmp/chain_frozen.npy")
    _ctx.update(decode_bits=decode_bits, NB=NB_BITS[7],
                fit_frame1=fit_frame1, a_to_lsf=a_to_lsf,
                a0=xf[:10], gc0=xf[10])


def run_one(task):
    gi, v = task
    if not _ctx:
        _init()
    bits = [0] * _ctx["NB"]
    for j, b in enumerate(GROUPS[gi]):
        if (v >> (len(GROUPS[gi]) - 1 - j)) & 1:  # group bits MSB-first
            bits[b] = 1
    pcm = _ctx["decode_bits"](7, [bits])[:160].astype(np.float64)
    A, GC, R = _ctx["fit_frame1"](pcm, _ctx["a0"], _ctx["gc0"])
    lsf = np.full((4, 10), np.nan)
    for k in range(4):
        try:
            lsf[k] = _ctx["a_to_lsf"](A[k])
        except AssertionError:
            pass
    return gi, v, lsf, GC, max(R)


def main(groups=None):
    tasks = []
    for gi in (groups or range(5)):
        for v in range(2 ** len(GROUPS[gi])):
            tasks.append((gi, v))
    out_lsf = {gi: np.full((2 ** len(GROUPS[gi]), 4, 10), np.nan)
               for gi in range(5)}
    out_gc = {gi: np.full((2 ** len(GROUPS[gi]), 4), np.nan)
              for gi in range(5)}
    out_res = {gi: np.full(2 ** len(GROUPS[gi]), np.nan) for gi in range(5)}
    with ProcessPoolExecutor(max_workers=8) as ex:
        for i, (gi, v, lsf, gc, r) in enumerate(ex.map(run_one, tasks,
                                                       chunksize=8)):
            out_lsf[gi][v] = lsf
            out_gc[gi][v] = gc
            out_res[gi][v] = r
            if i % 100 == 0:
                print(f"{i}/{len(tasks)} (g{gi} v{v} resid {r:.1e})",
                      flush=True)
    np.savez("/tmp/lsf_sweep.npz",
             **{f"lsf{gi}": out_lsf[gi] for gi in range(5)},
             **{f"gc{gi}": out_gc[gi] for gi in range(5)},
             **{f"res{gi}": out_res[gi] for gi in range(5)})
    print("saved /tmp/lsf_sweep.npz")


if __name__ == "__main__":
    main()
