"""Partition the 46 ISF bits into their MSVQ subvector index fields:
for bit pairs (a, b), compare the response of flipping both against the
sum of single-flip responses on the frame-2 burst window. Bits of the
SAME subvector index address one table lookup (strongly non-additive);
bits of different subvectors decode independently (additive up to the
mild LP nonlinearity). Greedy-cluster the non-additivity matrix and
write learned/isf_splits.json.

Expected structure (TS 26.201): stage 1 = 8+8 bits (dims 9+7), stage 2
= 6+7+7+5+5 bits (dims 3+3+3+3+4).
"""

from __future__ import annotations

import json
import os

import numpy as np

import wb

HERE = os.path.dirname(os.path.abspath(__file__))
GAIN_SF0 = [3, 20, 42, 28, 32, 38, 24]
ISF = [1, 2, 7, 8, 9, 47, 48, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61,
       62, 63, 64, 65, 66, 67, 68, 71, 74, 75, 76, 81, 82, 85, 86, 87,
       88, 89, 90, 93, 94, 95, 96, 97, 100, 101, 102, 103, 104]


def main():
    row = 4
    f2 = [0] * wb.BITS
    for i, b in enumerate(GAIN_SF0):
        f2[b] = (row >> (6 - i)) & 1
    base = wb.decode_bits([[0] * wb.BITS, f2])
    w = slice(320, 480)

    def resp(flips):
        bits = [0] * wb.BITS
        for b in flips:
            bits[b] = 1
        out = wb.decode_bits([bits, f2])
        return out[w] - base[w]

    singles = {b: resp([b]) for b in ISF}
    n = len(ISF)
    nl = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            a, b = ISF[i], ISF[j]
            d = resp([a, b])
            denom = np.linalg.norm(singles[a]) + np.linalg.norm(singles[b])
            nl[i, j] = nl[j, i] = float(
                np.linalg.norm(d - singles[a] - singles[b]) /
                max(denom, 1e-12))
    np.save(os.path.join(HERE, "learned", "isf_nonadd.npy"), nl)

    # greedy clustering: link pairs above a threshold
    thr = np.percentile(nl[nl > 0], 75)
    print("nonadd median/75p/max:",
          round(float(np.median(nl[nl > 0])), 3),
          round(float(thr), 3), round(float(nl.max()), 3))
    for t in (0.5, 0.8, 1.0, 1.5):
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(n):
            for j in range(i + 1, n):
                if nl[i, j] > t:
                    parent[find(i)] = find(j)
        groups = {}
        for i in range(n):
            groups.setdefault(find(i), []).append(ISF[i])
        sizes = sorted(len(v) for v in groups.values())
        print(f"thr {t}: {len(groups)} groups, sizes {sizes}")
        if sizes == sorted([8, 8, 6, 7, 7, 5, 5]):
            out = sorted(groups.values(), key=lambda v: v[0])
            json.dump(out, open(os.path.join(
                HERE, "learned", "isf_splits.json"), "w"), indent=1)
            print("MATCH — saved:", out)


if __name__ == "__main__":
    main()
