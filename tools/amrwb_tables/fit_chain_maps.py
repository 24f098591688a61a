"""Fit the empirical chain maps between the table-model synthesis
domain (12.8 kHz, exc -> 1/A16, gains_of units with kGcBase=1) and
lavc's 16 kHz output, under the pi2 protocol (scan_isf4: row-0 gains,
sf3 burst, differential vs code-0, converged index-0 ISF).

P (synth -> 16k): out[m] = sum_j P[m%5][j] * s[floor(0.8 m) + j - 12]
Q (16k -> synth): s[n]  = sum_j Q[n%4][j] * out[floor(1.25 n) + j - 15]

Writes learned/chain_maps.npz.
"""

import numpy as np

import wb
import isf_param as P_
import scan_isf4 as S4

NP_TAPS = 33
NQ_TAPS = 41
POSITIONS = (0, 2, 3, 5, 7, 9, 11, 13, 14)


def main():
    z = np.load("learned/isf_tables.npz")
    a16 = P_.isf_to_a(z["base16"])
    pairs = []
    for p in POSITIONS:
        s16 = 320 * S4.WARM
        on = wb.decode_bits(S4.frames_for({}, p))[s16: s16 + 640]
        off = wb.decode_bits(S4.frames_for({}, None))[s16: s16 + 640]
        out = S4.lp62(on - off)
        # model synthesis over frame5+frame6 at 12.8k (code diff:
        # +2@sf3pos p and +2@sf3pos0, gc = 1 at row 0)
        code = np.zeros(512)
        code[192 + 4 * p] += 2.0
        code[192] += 2.0
        s = np.zeros(512)
        for n in range(512):
            v = code[n]
            for k in range(1, 17):
                if n - k >= 0:
                    v -= a16[k] * s[n - k]
            s[n] = v
        pairs.append((s, out))

    rowsA, rowsY = [], []
    for s, out in pairs:
        for m in range(250, 620):
            base = int(0.8 * m)
            if base - 12 < 0 or base + NP_TAPS - 12 >= len(s):
                continue
            feat = np.zeros(5 * NP_TAPS)
            ph = m % 5
            feat[ph * NP_TAPS:(ph + 1) * NP_TAPS] = \
                s[base - 12: base - 12 + NP_TAPS]
            rowsA.append(feat)
            rowsY.append(out[m])
    A = np.array(rowsA)
    y = np.array(rowsY)
    xP, _, _, _ = np.linalg.lstsq(A, y, rcond=1e-3)
    relP = np.linalg.norm(A @ xP - y) / np.linalg.norm(y)
    print(f"P fit: rel resid {relP:.4f}")

    rowsA, rowsY = [], []
    for s, out in pairs:
        for n in range(200, 500):
            base = int(1.25 * n)
            if base - 15 < 0 or base + NQ_TAPS - 15 >= len(out):
                continue
            feat = np.zeros(4 * NQ_TAPS)
            ph = n % 4
            feat[ph * NQ_TAPS:(ph + 1) * NQ_TAPS] = \
                out[base - 15: base - 15 + NQ_TAPS]
            rowsA.append(feat)
            rowsY.append(s[n])
    A = np.array(rowsA)
    y = np.array(rowsY)
    xQ, _, _, _ = np.linalg.lstsq(A, y, rcond=1e-3)
    relQ = np.linalg.norm(A @ xQ - y) / np.linalg.norm(y)
    print(f"Q fit: rel resid {relQ:.4f}")

    np.savez("learned/chain_maps.npz",
             P=xP.reshape(5, NP_TAPS), Q=xQ.reshape(4, NQ_TAPS),
             relP=relP, relQ=relQ)
    print("saved learned/chain_maps.npz")


if __name__ == "__main__":
    main()
