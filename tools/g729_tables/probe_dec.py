"""First-light probes of the lavc g729 oracle: frame acceptance,
determinism, and a per-bit classification of the 80-bit frame by
first-divergence sample and response energy (the same opening move as
tools/amr_tables/extract_order.py). Writes learned/bit_classes.json.

G.729 8 kbps frame structure (ITU-T G.729, published): L0+L1+L2+L3 LSP
(1+7+5+5), then per 5 ms subframe: P1 lag (8 abs / 5 rel), P0 parity
(sf1 only, 1), C positions (13), S signs (4), GA+GB gains (3+4). The
probe's job is to pin WHERE each field sits in lavc's bit order and
then recover the tables behaviorally.
"""

from __future__ import annotations

import json
import os

import numpy as np

import oracle

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    zero = oracle.decode_bits([[0] * 80, [0] * 80])
    print("zero 2-frame rms:", float(np.sqrt((zero ** 2).mean())))

    rows = []
    for b in range(80):
        bits = [0] * 80
        bits[b] = 1
        out = oracle.decode_bits([bits, [0] * 80])
        d = np.abs(out - zero)
        nz = np.where(d > 1e-9)[0]
        rows.append(dict(
            bit=b,
            first=int(nz[0]) if len(nz) else None,
            last=int(nz[-1]) if len(nz) else None,
            energy=float((d ** 2).sum()),
            peak=float(d.max()),
        ))
        print(f"bit {b:2d}: first={rows[-1]['first']} "
              f"last={rows[-1]['last']} peak={rows[-1]['peak']:.2e}")
    with open(os.path.join(HERE, "learned", "bit_classes.json"), "w") as f:
        json.dump(rows, f, indent=1)
    # quick grouping report: bits whose effect starts in subframe 2
    sf2 = [r["bit"] for r in rows if r["first"] is not None
           and r["first"] >= 40]
    dead = [r["bit"] for r in rows if r["first"] is None]
    print("bits first affecting subframe 2:", sf2)
    print("dead-in-frame-1 bits:", dead)


if __name__ == "__main__":
    main()
