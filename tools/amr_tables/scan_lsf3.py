"""Permutation-invariant binary locator for the MR122 LSF codebooks.

The earlier delta scans (scan_lsf.py / scan_lsf2.py) assumed the group
bits map to table row indices as identity or bit-reversal and found
nothing — the storage-order bit significance within a group is evidently
scrambled. This scan is immune to BOTH the row permutation and the
mean/prediction offset: for a true table T[N][4] holding the residual
rows of group g at unit scale s, the SORTED per-column value lists obey

    diff(sorted(T[:, c])) == s * diff(sorted(M[:, c']))

where M[v] are the measured absolute frame-1 LSFs from the full sweep
(mean cancels in order-statistic differences, the row order never
enters). A 127-dimensional (N=128) match at a single fitted s is an
essentially zero-false-positive signature; column pairing c<->c' is then
read off directly and the row permutation recovered by nearest-row
matching, giving the exact int16 spec tables plus the group-bit order.

Same route as tools/aac_tables/extract.py: structural search with a
behavioral arbiter (the final tables must reproduce oracle decodes in
tests/test_amr_conformance.py).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LIB = "/usr/lib/x86_64-linux-gnu/libavcodec.so.59.37.100"
HERE = os.path.dirname(os.path.abspath(__file__))
# .rodata section (readelf -S): all of lavc's static const tables live
# here; scanning only it is ~30x faster than the whole image.
RODATA_OFF, RODATA_SIZE = 0x00AB4000, 0x253C80


def load_measured():
    z = np.load(os.path.join(HERE, "learned", "lsf_mr122.npz"))
    meas = []
    for g in range(5):
        q1, q2 = z[f"q1_{g}"], z[f"q2_{g}"]
        M = np.concatenate([q1, q2], 1)  # (N, 4): [q1_i, q1_j, q2_i, q2_j]
        meas.append(M)
    return meas


def column_signature(col, N):
    s = np.sort(col)
    return np.diff(s)


def scan_for_group(a16, M, min_scale=0.5, max_scale=8.0, rel_tol=0.02,
                   abs_tol=2.0):
    """Find offsets o where the stride-4 int16 array a16[o::4][:N] has a
    sorted-difference profile matching any measured column. Returns
    candidate (offset, table_col, meas_col, scale, err) tuples."""
    N = len(M)
    good = np.isfinite(M[:, 0])
    if good.sum() < N:
        return []  # need the full table for order statistics
    sig_m = [column_signature(M[:, c], N) for c in range(4)]
    L = len(a16)
    hits = []
    # Build the (maxo, N) strided view ONCE per column phase.
    maxo = L - 4 * N
    for c_meas in range(4):
        dm = sig_m[c_meas]
        dm_norm = float(np.dot(dm, dm))
        if dm_norm == 0:
            continue
        # scan all offsets: extract rows o + 4*k, sort, diff, compare.
        # Vectorized over offsets in chunks to bound memory.
        chunk = 1 << 18
        for o0 in range(0, maxo, chunk):
            n = min(chunk, maxo - o0)
            idx = (o0 + np.arange(n)[:, None]) + 4 * np.arange(N)[None, :]
            T = a16[idx].astype(np.float64)
            Ts = np.sort(T, axis=1)
            dT = np.diff(Ts, axis=1)          # (n, N-1)
            s = dT @ dm / dm_norm             # per-offset LS scale
            ok = (s > min_scale) & (s < max_scale)
            if not ok.any():
                continue
            err = np.abs(dT[ok] - s[ok, None] * dm[None])
            tol = np.maximum(abs_tol, rel_tol * np.abs(s[ok, None] * dm))
            hit = (err <= tol).all(axis=1)
            for i, oi in enumerate(np.where(ok)[0]):
                if hit[i]:
                    hits.append((int(o0 + oi), c_meas, float(s[oi]),
                                 float(err[i].max())))
    return hits


def recover_row_map(a16, off, M, scale):
    """Given a confirmed table start (column-0 offset), pair measured rows
    to table rows: returns perm[v] = table row index for group value v,
    the per-column measured<->table pairing, and the implied mean."""
    N = len(M)
    T = a16[off: off + 4 * N].astype(np.float64).reshape(N, 4)
    # column pairing: match by sorted-diff signature
    col_map = {}
    for cm in range(4):
        best = None
        for ct in range(4):
            if ct in col_map.values():
                pass
            d = np.diff(np.sort(T[:, ct])) - scale * np.diff(np.sort(M[:, cm]))
            e = float(np.abs(d).max())
            if best is None or e < best[1]:
                best = (ct, e)
        col_map[cm] = best[0]
    cols = [col_map[cm] for cm in range(4)]
    # mean per column from medians (offset between the two sorted lists)
    mean = np.array([np.median(M[:, cm] - T[:, cols[cm]] / scale)
                     for cm in range(4)])
    # row permutation by nearest neighbour in the 4-dim residual space
    perm = np.full(N, -1)
    used = set()
    resid = (M - mean[None]) * scale
    for v in range(N):
        d = np.abs(T[:, cols] - resid[v][None]).max(1)
        order = np.argsort(d)
        for r in order:
            if r not in used:
                perm[v] = r
                used.add(int(r))
                break
    err = np.abs(T[perm][:, cols] - resid).max()
    return perm, cols, mean, err


def main():
    raw = open(LIB, "rb").read()
    rod = raw[RODATA_OFF:RODATA_OFF + RODATA_SIZE]
    a16 = np.frombuffer(rod, np.int16, count=len(rod) // 2)
    meas = load_measured()
    groups = ([int(g) for g in sys.argv[1:]] if len(sys.argv) > 1
              else range(5))
    out = {}
    for g in groups:
        M = meas[g]
        hits = scan_for_group(a16, M)
        # collapse: a true [N][4] table fires on 4 offsets (one per column)
        print(f"group {g} (N={len(M)}): {len(hits)} column hits")
        for h in sorted(hits, key=lambda h: h[3])[:12]:
            print(f"   off16={h[0]} byte={2 * h[0]} meas_col={h[1]} "
                  f"s={h[2]:.4f} err={h[3]:.2f}")
        out[g] = hits
    with open(os.path.join(HERE, "learned", "lsf_scan3_hits.json"),
              "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
