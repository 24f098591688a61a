"""Identify the WB lag fields and their decode laws via shifted-echo
probes: frame 1 carries a LOUD subframe-0 burst (gain row 114: gc
32767), subframe 1 runs a high-gp/low-gc gain row (119: gp 1.16, gc
1370) so its output is dominated by the adaptive read of the burst.
Flipping a lag bit shifts WHERE the adaptive codebook reads — the
response cross-correlates with a time-shifted copy of the base
subframe-1 output. The shift-per-index sweep then gives the lag law
directly (in 16 kHz output samples; internal 12.8 kHz lag = shift*4/5).

Writes learned/lag_probes.json: for each candidate sf1 bit, the echo
shift (in output samples, parabolic-refined) and correlation.
"""

from __future__ import annotations

import json
import os

import numpy as np

import wb

HERE = os.path.dirname(os.path.abspath(__file__))
GAIN_SF0 = [3, 20, 42, 28, 32, 38, 24]
ISF = {1, 2, 7, 8, 9, 47, 48, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61,
       62, 63, 64, 65, 66, 67, 68, 71, 74, 75, 76, 81, 82, 85, 86, 87,
       88, 89, 90, 93, 94, 95, 96, 97, 100, 101, 102, 103, 104}
GAINS = {b + sf for b in GAIN_SF0 for sf in range(4)}


def set_gain(bits, sf, row):
    for i, b in enumerate(GAIN_SF0):
        bits[b + sf] = (row >> (6 - i)) & 1


def echo_delays(d, base, w0, lo=25, hi=295):
    """Cross-correlate the sf1 diff (80 samples starting at output
    index w0) against delayed copies of the decoded base: score(delta)
    = |corr(d[n], base[w0 + n - delta])|. A lag-bit flip produces two
    peaks (the new and old read positions). Returns the top-3
    (delta, corr) pairs."""
    scores = []
    nd = np.linalg.norm(d) + 1e-18
    pad = 400
    bp = np.concatenate([np.zeros(pad), base])
    for delta in range(lo, hi):
        seg = bp[pad + w0 - delta: pad + w0 - delta + len(d)]
        ns = np.linalg.norm(seg) + 1e-18
        scores.append((abs(float(np.dot(d, seg))) / (nd * ns), delta))
    scores.sort(reverse=True)
    # keep peaks separated by >= 5 samples
    out = []
    for c, delta in scores:
        if all(abs(delta - dd) >= 5 for _, dd in out):
            out.append((round(c, 3), delta))
        if len(out) == 3:
            break
    return out


def main():
    base_bits = [0] * wb.BITS
    set_gain(base_bits, 0, 114)   # loud burst in sf0
    set_gain(base_bits, 1, 119)   # sf1 = mostly adaptive read
    base = wb.decode_bits([base_bits, [0] * wb.BITS])
    w = slice(80, 160)
    ref = base[w].copy()
    print("sf1 base rms:", float(np.sqrt((ref ** 2).mean())))

    rows = []
    # candidate sf1 bits: onset sf1, not gain/ISF
    cls = json.load(open(os.path.join(HERE, "learned",
                                      "bit_classes.json")))
    sf1_bits = [r["bit"] for r in cls
                if r["first"] is not None and 80 <= r["first"] < 160
                and r["bit"] not in GAINS and r["bit"] not in ISF]
    print("sf1 candidates:", sf1_bits)
    for b in sf1_bits:
        bb = list(base_bits)
        bb[b] ^= 1
        out = wb.decode_bits([bb, [0] * wb.BITS])
        d = out[w] - base[w]
        e = float(np.dot(d, d) / max(np.dot(ref, ref), 1e-18))
        peaks = echo_delays(d, base, 80)
        rows.append(dict(bit=b, rel_energy=round(e, 4), peaks=peaks))
        print(f"bit {b:3d}: relE {e:8.4f} peaks {peaks}")
    with open(os.path.join(HERE, "learned", "lag_probes.json"),
              "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
