"""Identify the full 46-bit ISF field: flip each frame-1 bit and
measure its effect on FRAME 2's subframe-0 response, where frame 2
carries a loud fixed-code burst through a gain row with near-zero
pitch gain (adaptive leakage from frame 1 suppressed). Only ISF bits
reach frame 2 through the MA predictor + LP interpolation; code/gain
bits of frame 1 can only leak through the (suppressed) adaptive path.
Writes learned/isf_set.json.
"""

from __future__ import annotations

import json
import os

import numpy as np

import wb

HERE = os.path.dirname(os.path.abspath(__file__))
GAIN_SF0 = [3, 20, 42, 28, 32, 38, 24]  # true MSB-first (FACTS.md)

# gain table rows (byte 11372064): pick a loud-gc, small-gp row
LIB = "/usr/lib/x86_64-linux-gnu/libavcodec.so.59.37.100"


def gain_row_bits(row):
    """Storage bit values that select gain-VQ row `row` in sf0."""
    # invert the pinned weight map: my MSB-first positions [3,20,42,28,
    # 32,38,24] carry weights [64,32,16,8,4,2,1] of the TABLE index.
    return {b: (row >> (6 - i)) & 1 for i, b in enumerate(GAIN_SF0)}


def main():
    blk = np.fromfile(LIB, np.uint8)[11372064:11372064 + 512] \
        .view(np.int16).reshape(128, 2)
    ok = [(int(r[1]), int(r[0]), i) for i, r in enumerate(blk)
          if r[0] < 800]
    gc, gp, row = max(ok)
    print(f"frame-2 burst row {row}: gp {gp} gc {gc}")

    f2 = [0] * wb.BITS
    for b, v in gain_row_bits(row).items():
        f2[b] = v

    base = wb.decode_bits([[0] * wb.BITS, f2])
    w = slice(320, 400)
    eb = float((base[w] ** 2).sum())
    rows = []
    for b in range(wb.BITS):
        bits = [0] * wb.BITS
        bits[b] = 1
        out = wb.decode_bits([bits, f2])
        d = out[w] - base[w]
        rows.append(dict(bit=b, e_f2sf0=float((d ** 2).sum() / eb)))
    with open(os.path.join(HERE, "learned", "isf_set.json"), "w") as f:
        json.dump(rows, f, indent=1)
    es = np.array([r["e_f2sf0"] for r in rows])
    order = np.argsort(es)[::-1]
    print("top-50 leakers:", sorted(int(b) for b in order[:50]))
    print("energy at rank 40..52:",
          [f"{es[order[i]]:.2e}" for i in range(40, 52)])


if __name__ == "__main__":
    main()
