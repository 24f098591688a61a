"""Classify WB bits by HOW they change the output on a nonzero base:
a gain-VQ bit rescales its subframe's output (diff correlates ~1 with
the base output in that window); a code bit changes the shape; an ISF
bit warps the spectrum across ALL subframes; a lag bit re-points the
adaptive read. Writes learned/shape_classes.json.
"""

from __future__ import annotations

import json
import os

import numpy as np

import wb

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    base_bits = [0] * wb.BITS
    for b in range(60, 253, 7):
        base_bits[b] = 1
    base = wb.decode_bits([base_bits, [0] * wb.BITS])

    rows = []
    for b in range(wb.BITS):
        bb = list(base_bits)
        bb[b] ^= 1
        out = wb.decode_bits([bb, [0] * wb.BITS])
        d = out - base
        nz = np.where(np.abs(d) > 1e-8)[0]
        if not len(nz):
            rows.append(dict(bit=b, first=None))
            continue
        first = int(nz[0])
        sf = min(first // 80, 3)
        w0, w1 = sf * 80, sf * 80 + 80
        seg_d = d[w0:w1]
        seg_b = base[w0:w1]
        denom = np.linalg.norm(seg_d) * np.linalg.norm(seg_b)
        c_here = float(np.dot(seg_d, seg_b) / denom) if denom > 0 else 0.0
        # energy split: own subframe vs the rest of frame 1 vs frame 2
        e_own = float((seg_d ** 2).sum())
        e_f1 = float((d[:320] ** 2).sum())
        e_f2 = float((d[320:] ** 2).sum())
        rows.append(dict(bit=b, first=first, sf=sf,
                         corr_base=round(c_here, 4),
                         e_own_frac=round(e_own / max(e_f1, 1e-30), 4),
                         e_f2_frac=round(e_f2 / max(e_f1 + e_f2, 1e-30), 4)))
    with open(os.path.join(HERE, "learned", "shape_classes.json"),
              "w") as f:
        json.dump(rows, f, indent=1)
    scale_bits = [r["bit"] for r in rows
                  if r.get("corr_base") is not None
                  and abs(r["corr_base"]) > 0.97]
    print("scale-like (|corr|>0.97):", scale_bits)
    persist = [r["bit"] for r in rows
               if r.get("e_f2_frac") is not None and r["e_f2_frac"] > 0.5]
    print("frame-2-persistent (>50% energy in frame 2):", persist)


if __name__ == "__main__":
    main()
