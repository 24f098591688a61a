"""Measure the WB 7-bit gain-VQ ladder behaviorally: in frame 1,
subframe 0 has zero adaptive history, so its output is chain(gc * code0)
— sweeping the 7 gain bits {3,20,24,28,32,38,42} (shape-probe
candidates, MSB-first hypothesis) rescales the window by gc(idx)/gc(0).
Writes learned/gain_ladder.json: 128 measured scale ratios.

The ladder is then matched against int16 [128][2] candidate blocks in
the lavc binary (scan_gains.py) the way the NB campaign pinned
gains_high/gains_low/gains_MR475.
"""

from __future__ import annotations

import json
import os

import numpy as np

import wb

HERE = os.path.dirname(os.path.abspath(__file__))
GAIN_SF0 = [3, 20, 24, 28, 32, 38, 42]  # MSB-first hypothesis


def main():
    base = wb.decode_bits([[0] * wb.BITS, [0] * wb.BITS])
    w = slice(0, 80)
    r0 = float(np.sqrt((base[w] ** 2).mean()))
    ratios = []
    for g in range(128):
        bits = [0] * wb.BITS
        for i, b in enumerate(GAIN_SF0):
            bits[b] = (g >> (6 - i)) & 1
        out = wb.decode_bits([bits, [0] * wb.BITS])
        r = float(np.sqrt((out[w] ** 2).mean()))
        # correlation with the base window confirms pure rescale
        c = float(np.corrcoef(out[w], base[w])[0, 1])
        ratios.append(dict(idx=g, ratio=r / max(r0, 1e-12),
                           corr=round(c, 5)))
    with open(os.path.join(HERE, "learned", "gain_ladder.json"),
              "w") as f:
        json.dump(ratios, f, indent=1)
    rs = np.array([x["ratio"] for x in ratios])
    cs = np.array([x["corr"] for x in ratios])
    print("ratio range:", rs.min(), rs.max())
    print("windows with |corr|<0.9:", int((np.abs(cs) < 0.9).sum()))
    print("first 16 ratios:", np.round(rs[:16], 3).tolist())


if __name__ == "__main__":
    main()
