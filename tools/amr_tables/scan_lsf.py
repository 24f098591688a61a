"""Locate the MR122 LSF split-matrix codebooks in the in-image lavc
binary by matching measured probe deltas (probe_lsf_ids.npz).

In frame 1 the predictor memory is zero, so for group g / row v the
fitted subframe-2 LSFs are mean + T_g[v][cols q1] and subframe-4 LSFs
mean + T_g[v][cols q2]; row differences T_g[v] - T_g[0] therefore equal
the measured LSF differences up to one global unit scale s (the tables'
LSF unit). We scan every int16 offset for arrays [N][4] whose row
differences match all good probes under a single fitted s, testing
column permutations and index-bit-order hypotheses.

Same route as tools/aac_tables/extract.py: structural search, behavioral
arbiter (the final tables must reproduce oracle decodes end-to-end in
tests/test_amr_conformance.py).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sweep_lsf import GROUPS  # noqa: E402

LIB = "/usr/lib/x86_64-linux-gnu/libavcodec.so.59.37.100"
HERE = os.path.dirname(os.path.abspath(__file__))

# fit row (subframe) indices: fit sf1 = spec subframe 2 (= q1),
# fit sf3 = spec subframe 4 (= q2)
SF_Q1, SF_Q2 = 1, 3
PAIRS = [(0, 1), (2, 3), (4, 5), (6, 7), (8, 9)]

COLPERMS = {
    "q1q1q2q2": [0, 1, 2, 3],   # [r1(i), r1(i+1), r2(i), r2(i+1)]
    "q1q2q1q2": [0, 2, 1, 3],   # interleaved
}


def load_probes():
    z = np.load(os.path.join(HERE, "learned", "probe_lsf_ids.npz"))
    keys, lsf, resid = z["keys"], z["lsf"], z["resid"]
    base = None
    per_group = {gi: [] for gi in range(5)}
    for (gi, v), L, r in zip(keys, lsf, resid):
        if v == 0:
            base = L
            continue
        if r < 1e-4 and np.isfinite(L[[SF_Q1, SF_Q2]]).all():
            per_group[gi].append((int(v), L))
    assert base is not None
    return base, per_group


def deltas_for(base, L, gi):
    c0, c1 = PAIRS[gi]
    return np.array([
        L[SF_Q1, c0] - base[SF_Q1, c0],
        L[SF_Q1, c1] - base[SF_Q1, c1],
        L[SF_Q2, c0] - base[SF_Q2, c0],
        L[SF_Q2, c1] - base[SF_Q2, c1],
    ])


def bitrev(v, n):
    out = 0
    for _ in range(n):
        out = (out << 1) | (v & 1)
        v >>= 1
    return out


def scan_group(a16, gi, probes, base, nbits=None, tol_hz=6.0):
    """Return candidate (offset_int16, perm, vmap, scale, err) tuples."""
    nbits = nbits or len(GROUPS[gi])
    N = 1 << nbits
    L = len(a16)
    hits = []
    # measured deltas (Hz), per probe
    meas = {v: deltas_for(base, Lf, gi) for v, Lf in probes}
    vs = sorted(meas)
    Dhz = np.stack([meas[v] for v in vs])  # (P, 4)
    for vmap_name in ("id", "rev"):
        rows = np.array([v if vmap_name == "id" else bitrev(v, nbits)
                         for v in vs])
        for pname, perm in COLPERMS.items():
            # stage 1: coarse filter on the largest-|delta| entries
            # D_table[p, c] = a16[o + 4*rows[p] + perm[c]] - a16[o + perm[c]]
            maxo = L - 4 * N
            if maxo <= 0:
                continue
            # fit scale s per offset: s = sum(Dt*Dhz)/sum(Dhz^2)
            denom = float((Dhz ** 2).sum())
            num = np.zeros(maxo)
            for p, v in enumerate(rows):
                for c in range(4):
                    sl = a16[4 * v + perm[c]: 4 * v + perm[c] + maxo]\
                        .astype(np.float64)
                    s0 = a16[perm[c]: perm[c] + maxo].astype(np.float64)
                    num += (sl - s0) * Dhz[p, c]
            s = num / denom
            # stage 2: residual check only where s is plausible
            cand = np.where((np.abs(s) > 0.5) & (np.abs(s) < 40))[0]
            if len(cand) > 2_000_000:
                continue
            err = np.zeros(len(cand))
            for p, v in enumerate(rows):
                for c in range(4):
                    dt = (a16[cand + 4 * v + perm[c]].astype(np.float64)
                          - a16[cand + perm[c]])
                    err = np.maximum(err, np.abs(dt - s[cand] * Dhz[p, c]))
            # tolerance in table units: tol_hz * |s|
            ok = cand[err < tol_hz * np.abs(s[cand])]
            for o in ok:
                hits.append((int(o), pname, vmap_name, float(s[o]),
                             float(err[np.searchsorted(cand, o)])))
    return hits


def main():
    raw = open(LIB, "rb").read()
    a16 = np.frombuffer(raw, np.int16, count=len(raw) // 2)
    base, per_group = load_probes()
    out = {}
    for gi in range(5):
        probes = per_group[gi]
        print(f"group {gi}: {len(probes)} good probes")
        hits = scan_group(a16, gi, probes, base)
        # collapse overlapping hits (same table found at shifted rows)
        print(f"  hits: {len(hits)}")
        for h in hits[:10]:
            print(f"   off16={h[0]} byte={2*h[0]} perm={h[1]} vmap={h[2]} "
                  f"s={h[3]:.4f} err={h[4]:.2f}")
        out[gi] = hits
    with open(os.path.join(HERE, "learned", "lsf_scan_hits.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
