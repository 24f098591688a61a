"""Locate the WB 7-bit joint gain VQ table in the lavc binary by
matching the behaviorally measured gc ladder (probe_gains.py): slide an
int16 [128][2] window over the library image and correlate column 2's
ratio-to-row-0 with the measured ratios in the log domain. The NB
campaign pinned gains_high/gains_low/gains_MR475 the same way at bytes
11344480..11346272.
"""

from __future__ import annotations

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
LIB = "/usr/lib/x86_64-linux-gnu/libavcodec.so.59.37.100"


def main():
    meas = json.load(open(os.path.join(HERE, "learned",
                                       "gain_ladder.json")))
    r = np.array([m["ratio"] for m in meas])
    lr = np.log(np.maximum(r, 1e-9))

    data = np.fromfile(LIB, np.uint8)
    a16 = data[: len(data) & ~1].view(np.int16)
    best = []
    # scan even byte offsets; candidate block = 256 int16
    for col in (0, 1):  # which int16 of the pair is the code-gain column
        for off in range(0, len(a16) - 256, 1):
            blk = a16[off:off + 256].reshape(128, 2)
            g = blk[:, col].astype(np.float64)
            if g[0] <= 0 or (g <= 0).any():
                continue
            lg = np.log(g / g[0])
            # quick reject on range
            if abs(lg.max() - lr.max()) > 0.5 or abs(lg.min() - lr.min()) > 0.5:
                continue
            err = float(np.abs(lg - lr).mean())
            best.append((err, off * 2, col))
    best.sort()
    for err, byte, col in best[:10]:
        print(f"byte {byte} col {col}: mean |log err| {err:.4f}")
    if best and best[0][0] < 0.02:
        err, byte, col = best[0]
        blk = a16[byte // 2: byte // 2 + 256].reshape(128, 2)
        np.save(os.path.join(HERE, "learned", "qua_gain7b.npy"), blk)
        print("PINNED: [128][2] int16 @", byte, "code-gain col", col)
        print("rows 0..7:", blk[:8].tolist())


if __name__ == "__main__":
    main()
