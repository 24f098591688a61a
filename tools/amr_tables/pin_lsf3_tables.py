"""Pin the 3-index LSF tables for the non-MR122 modes: slide-match the
behaviorally measured mode-7k95 LSFs (probe_lsf3.py) against int16
windows of the lavc binary, exactly as scan_lsf4.py did for MR122.

In frame 1 the MA predictor memory is zero, so measured(sf4) =
mean_lsf_3 + row/4.096 — i.e. (measured - window_row/4.096) must be
column-constant over all probed indices; the constant IS the mean.
"""

from __future__ import annotations

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
LIB = "/usr/lib/x86_64-linux-gnu/libavcodec.so.59.37.100"
SCALE = 4.096

GROUPS = [(0, 3, 512, slice(0, 3)),   # lsf0 (7k95 variant: 9 bits)
          (1, 3, 512, slice(3, 6)),   # lsf1
          (2, 4, 512, slice(6, 10))]  # lsf2


def main():
    z = np.load(os.path.join(HERE, "learned", "lsf3_probe.npz"))
    data = open(LIB, "rb").read()
    lo, hi = 11326000, 11372000
    a16 = np.frombuffer(data[lo:hi], np.int16).astype(np.float64)

    for g, ncol, nrows, cols in GROUPS:
        vs, M = [], []
        for key in z.files:
            if key.startswith(f"g{g}_v") and not key.endswith("resid"):
                v = int(key.split("_v")[1])
                row = z[key][cols]
                if np.isfinite(row).all():
                    vs.append(v)
                    M.append(row)
        vs = np.array(vs)
        M = np.array(M) * SCALE  # to table units
        print(f"group {g}: {len(vs)} usable probes")
        hits = []
        maxo = len(a16) - ncol * nrows
        for off in range(maxo):
            W = a16[off:off + ncol * nrows].reshape(nrows, ncol)
            if np.abs(W).max() > 20000:
                continue
            D = M - W[vs]
            dev = np.abs(D - np.median(D, axis=0)).max()
            if dev < 12.0:  # ~3 Hz
                hits.append((off, dev, np.median(D, axis=0) / SCALE))
        for off, dev, mean in hits:
            print(f"  HIT byte {lo + 2 * off} dev {dev:.2f} "
                  f"mean(Hz) {np.round(mean, 2)}")
        if len(hits) == 1:
            off = hits[0][0]
            np.save(os.path.join(HERE, "learned", f"lsf3_g{g}_off.npy"),
                    np.array([lo + 2 * off]))


if __name__ == "__main__":
    main()
