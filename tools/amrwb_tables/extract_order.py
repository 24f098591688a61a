"""Per-bit classification of the 253-bit AMR-WB 12.65k storage frame:
flip each bit on top of the zero frame (and on a nonzero base), record
first/last divergence sample, response energy, and whether the bit is
dead in frame 1 (the adaptive-codebook signature that identified the
NB lag fields). Writes learned/bit_classes.json.
"""

from __future__ import annotations

import json
import os

import numpy as np

import wb

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    zero = wb.decode_bits(wb.zero_frames(2))
    # a nonzero base exposes bits whose effect is multiplicative/dead at
    # zero (gains over zero excitation, lags over zero history)
    base_bits = [0] * wb.BITS
    for b in range(60, 253, 7):
        base_bits[b] = 1
    base = wb.decode_bits([base_bits, [0] * wb.BITS])

    rows = []
    for b in range(wb.BITS):
        bits = [0] * wb.BITS
        bits[b] = 1
        out = wb.decode_bits([bits, [0] * wb.BITS])
        d = np.abs(out - zero)
        nz = np.where(d > 1e-8)[0]
        bb = list(base_bits)
        bb[b] ^= 1
        out2 = wb.decode_bits([bb, [0] * wb.BITS])
        d2 = np.abs(out2 - base)
        nz2 = np.where(d2 > 1e-8)[0]
        rows.append(dict(
            bit=b,
            first=int(nz[0]) if len(nz) else None,
            last=int(nz[-1]) if len(nz) else None,
            energy=float((d ** 2).sum()),
            first_base=int(nz2[0]) if len(nz2) else None,
            energy_base=float((d2 ** 2).sum()),
        ))
    with open(os.path.join(HERE, "learned", "bit_classes.json"), "w") as f:
        json.dump(rows, f, indent=1)

    # report: cluster by onset quartile (subframes upsample to 80)
    def bucket(v):
        if v is None:
            return "dead"
        return str(min(v // 80, 3))

    groups = {}
    for r in rows:
        groups.setdefault(bucket(r["first"]), []).append(r["bit"])
    for k in sorted(groups):
        v = groups[k]
        print(f"onset sf{k}: {len(v)} bits: {v}")
    dead0 = [r["bit"] for r in rows if r["first"] is None]
    deadb = [r["bit"] for r in rows if r["first_base"] is None]
    print("dead on zero base:", dead0)
    print("dead on nonzero base:", deadb)


if __name__ == "__main__":
    main()
