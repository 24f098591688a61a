"""Extended binary scan for the MR122 LSF codebooks: float32 tables,
q2-first column layouts, sign-bit hypothesis for the 9-bit group, wider
unit-scale window. See scan_lsf.py for the identification math."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scan_lsf import load_probes, deltas_for, bitrev  # noqa: E402
from sweep_lsf import GROUPS  # noqa: E402

LIB = "/usr/lib/x86_64-linux-gnu/libavcodec.so.59.37.100"

COLPERMS = {
    "q1q1q2q2": [0, 1, 2, 3],
    "q1q2q1q2": [0, 2, 1, 3],
    "q2q2q1q1": [2, 3, 0, 1],
    "q2q1q2q1": [3, 1, 2, 0],
}


def scan(arr, gi, probes, base, nbits, sign_bit=None, tol_rel=0.02,
         tol_abs_hz=4.0, smin=1e-4, smax=100.0):
    """sign_bit: None, or 'msb' (value >= 2^(nbits-1) negates row
    value-index v mod 2^(nbits-1))."""
    meas = {}
    for v, L in probes:
        meas[v] = deltas_for(base, L, gi)
    vs = sorted(meas)
    Dhz = np.stack([meas[v] for v in vs])
    L = len(arr)
    results = []
    nrow_bits = nbits - (1 if sign_bit else 0)
    N = 1 << nrow_bits
    for vmap_name in ("id", "rev"):
        rows, sgns, keep = [], [], []
        for i, v in enumerate(vs):
            w = v if vmap_name == "id" else bitrev(v, nbits)
            sg = 1.0
            if sign_bit == "msb":
                if w >= N:
                    sg, w = -1.0, w - N
            rows.append(w)
            sgns.append(sg)
            keep.append(i)
        rows = np.array(rows)
        sgns = np.array(sgns)
        D = Dhz[keep]
        for pname, perm in COLPERMS.items():
            maxo = L - 4 * N
            if maxo <= 0:
                continue
            # sign hypothesis: lsf = mean + sg * T[w]  =>
            #   sg*T[w] - T[0_row at sign +] ... row 0 of baseline has v=0
            #   => sg=+1, w=0. delta = sg*T[w] - T[0].
            denom = float((D ** 2).sum())
            num = np.zeros(maxo, np.float64)
            for p in range(len(rows)):
                for c in range(4):
                    tv = arr[4 * rows[p] + perm[c]: 4 * rows[p] + perm[c]
                             + maxo].astype(np.float64) * sgns[p]
                    t0 = arr[perm[c]: perm[c] + maxo].astype(np.float64)
                    num += (tv - t0) * D[p, c]
            s = num / denom
            cand = np.where((np.abs(s) > smin) & (np.abs(s) < smax))[0]
            if not len(cand):
                continue
            err = np.zeros(len(cand))
            mag = np.zeros(len(cand))
            for p in range(len(rows)):
                for c in range(4):
                    tv = arr[cand + 4 * rows[p] + perm[c]]\
                        .astype(np.float64) * sgns[p]
                    t0 = arr[cand + perm[c]].astype(np.float64)
                    e = np.abs((tv - t0) - s[cand] * D[p, c])
                    err = np.maximum(err, e)
                    mag = np.maximum(mag, np.abs(s[cand] * D[p, c]))
            tol = np.maximum(tol_abs_hz * np.abs(s[cand]), tol_rel * mag)
            ok = np.where(err < tol)[0]
            for i in ok:
                results.append((int(cand[i]), pname, vmap_name,
                                sign_bit or "-", float(s[cand[i]]),
                                float(err[i])))
    return results


def main():
    raw = open(LIB, "rb").read()
    a16 = np.frombuffer(raw, np.int16, count=len(raw) // 2)
    f32 = np.frombuffer(raw, np.float32, count=len(raw) // 4).copy()
    f32[~np.isfinite(f32)] = 0.0
    f32[np.abs(f32) > 1e6] = 0.0
    base, per_group = load_probes()
    for gi in range(5):
        nbits = len(GROUPS[gi])
        probes = per_group[gi]
        variants = [(None,)] if nbits != 9 else [(None,), ("msb",)]
        for (sb,) in variants:
            pr = probes if sb is None else probes
            for name, arr in (("i16", a16), ("f32", f32)):
                hits = scan(arr, gi, pr, base, nbits, sign_bit=sb)
                hits.sort(key=lambda h: h[-1])
                print(f"g{gi} {name} sign={sb}: {len(hits)} hits")
                for h in hits[:6]:
                    unit = 2 if name == "i16" else 4
                    print(f"   off_elem={h[0]} byte={unit*h[0]} perm={h[1]} "
                          f"vmap={h[2]} s={h[4]:.5f} err={h[5]:.3f}")


if __name__ == "__main__":
    main()
