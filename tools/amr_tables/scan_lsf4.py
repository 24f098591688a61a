"""Definitive MR122 LSF codebook extraction from the in-image binary.

Established by the earlier scans: the group tables are int16 [N][4] at
element stride 4, value = (measured_lsf - mean) * 4.096, with IDENTITY
row mapping under the measured storage-bit enumeration (group 4 confirmed
first), and the 9-bit group 2 is a signed VQ: 256 rows + sign bit 8
(verified from measured data alone: M[v] + M[v^256] is constant to 0.55
across all good rows).

This scan is therefore direct: for each group, slide an [N][4] int16
window over the whole library file and score the per-column constancy of
D = M*4.096 - T with a median-of-absolute-deviations statistic (robust to
the ~8% known-bad measured rows). A hit pins the exact spec table AND the
per-column mean (combined lsf mean at zero prediction state).

Behavioral arbiter: the extracted tables must reproduce oracle decodes
(tests/test_amr_conformance.py) — same route as tools/aac_tables/.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
LIB = "/usr/lib/x86_64-linux-gnu/libavcodec.so.59.37.100"
SCALE = 4.096


def load_groups():
    z = np.load(os.path.join(HERE, "learned", "lsf_mr122.npz"))
    groups = []
    for g in range(5):
        M = np.concatenate([z[f"q1_{g}"], z[f"q2_{g}"]], 1)  # (N,4)
        if g == 2:
            lo, hi = M[:256], M[256:]
            good = np.isfinite(lo).all(1) & np.isfinite(hi).all(1)
            R = (lo - hi) / 2.0 * SCALE  # mean-free signed residual
            # drop rows with bad column-1/3 fits (pairing dev > 1)
            dev = np.abs((lo + hi) - np.median((lo + hi)[good], 0))
            good &= (dev < 1.0).all(1)
            groups.append(("resid", R, good))
        else:
            good = np.isfinite(M).all(1)
            groups.append(("abs", M * SCALE, good))
    return groups


def scan(a16, kind, V, good, tol=3.0, min_good_frac=0.8):
    """Return offsets where a16[o:o+4N].reshape(N,4) matches V (row-good
    mask `good`) up to a per-column constant (kind='abs') or exactly
    (kind='resid'), with median-|dev| <= tol in every column."""
    N = len(V)
    rows = np.where(good)[0]
    Vg = V[rows]
    maxo = len(a16) - 4 * N
    hits = []
    chunk = 1 << 15
    base_idx = 4 * rows[None, :, None] + np.arange(4)[None, None, :]
    for o0 in range(0, maxo, chunk):
        n = min(chunk, maxo - o0)
        idx = (o0 + np.arange(n)[:, None, None]) + base_idx
        T = a16[idx].astype(np.float32)  # (n, |rows|, 4)
        D = Vg[None].astype(np.float32) - T
        if kind == "abs":
            D = D - np.median(D, axis=1, keepdims=True)
        err = np.median(np.abs(D), axis=1)  # (n, 4)
        ok = (err <= tol).all(axis=1)
        for oi in np.where(ok)[0]:
            hits.append((int(o0 + oi), [float(e) for e in err[oi]]))
    return hits


def confirm(a16, kind, V, good, off):
    N = len(V)
    T = a16[off: off + 4 * N].astype(np.float64).reshape(N, 4)
    D = V - T
    if kind == "abs":
        mean = np.median(D[good], 0)
        D = D - mean[None]
    else:
        mean = np.zeros(4)
    resid = np.abs(D[good]).max()
    return T.astype(np.int16), mean / SCALE, float(resid)


def main():
    raw = np.frombuffer(open(LIB, "rb").read(), np.uint8)
    a16 = raw[: len(raw) // 2 * 2].view(np.int16)
    groups = load_groups()
    out = {}
    report = {}
    for g, (kind, V, good) in enumerate(groups):
        hits = scan(a16, kind, V, good)
        print(f"group {g} N={len(V)} kind={kind} good={good.sum()}: "
              f"{len(hits)} hits")
        for off, errs in hits[:5]:
            print(f"   off16={off} byte={2*off} err={errs}")
        if len(hits) == 1:
            T, mean, resid = confirm(a16, kind, V, good, hits[0][0])
            print(f"   CONFIRMED max|dev| over good rows = {resid:.3f} "
                  f"mean(meas units) = {np.array2string(mean, precision=4)}")
            out[f"table_{g}"] = T
            out[f"mean_{g}"] = mean
            report[str(g)] = {"byte": 2 * hits[0][0], "resid": resid}
    if out:
        np.savez(os.path.join(HERE, "learned", "lsf_tables_bin.npz"), **out)
    with open(os.path.join(HERE, "learned", "lsf_scan4_hits.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
