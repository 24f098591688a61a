"""Pin the low-mode pitch lag decode laws by candidate matching.

Stream layout: every subframe before the probe carries spread pulses
with a strong-gc/low-gp gain row, building a pulse-rich measured
history deep enough to cover the probed lag range (abs probes run at
frame 2 sf2 -> 240 samples of history). The probed subframe uses a
strong-gp/low-gc row so the adaptive contribution dominates. Its
excitation is fitted per candidate (T0, frac) on the 1/3 grid as

  exc ~= gp*v(T0,frac) + gc*code0 [+ dispersed code] [+ sharp shift]

and the candidate whose residual collapses IS the decode (margin =
second-best/best residual recorded per probe).

Outputs learned/low_lag_probes.json.
"""

from __future__ import annotations

import json
import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import amrnb_low as L  # noqa: E402
from modes_lab import LowChain, make_frame, MODE_IDX  # noqa: E402
from oracle import decode_bits  # noqa: E402
from probe_low_lags_common import all_zero_as, gain_row  # noqa: E402

# spread-pulse field values per mode (positions noted; any value works,
# these cover the adaptive read windows well)
RICH_PULSES = {"4k75": 60, "5k15": 60, "5k9": 140, "6k7": 356,
               "7k4": 4706, "7k95": 4706}


def probe_gain_row(mode):
    """Strong gp, small gc for the probed subframe."""
    if mode in ("5k15", "5k9"):
        T = L.GAINS_LOW
    elif mode in ("6k7", "7k4", "10k2"):
        T = L.GAINS_HIGH
    else:  # 7k95: scalar; max pitch gain (fixed_gain handled separately)
        return 15
    ok = np.where(T[:, 1] < 1000)[0]
    return int(ok[np.argmax(T[ok, 0])])


def probe_one(args):
    mode, fi, sf, prev_abs_idx, lag_v = args
    F = L.fields(mode)
    grow = gain_row(mode)
    base = {}
    for (name, s), bits in F.items():
        if name == "p_gain":
            base[(name, s)] = grow
        elif name == "p_lag":
            base[(name, s)] = (1 << len(bits)) - 1
        elif name == "pulse0":
            base[(name, s)] = RICH_PULSES[mode]
        elif name == "fixed_gain":
            base[(name, s)] = 20  # 7k95: decent code gain for history
    nsf = 4 * fi + sf
    frames_vals = [dict(base) for _ in range(fi + 1)]
    pv = frames_vals[fi]
    pv[("p_gain", sf)] = probe_gain_row(mode)
    if mode == "7k95":
        pv[("fixed_gain", sf)] = 0
    if prev_abs_idx is not None:
        abs_sfs = [s for (n, s), b in F.items()
                   if n == "p_lag" and len(b) == 8 and s < sf]
        pv[("p_lag", max(abs_sfs))] = prev_abs_idx
    pv[("p_lag", sf)] = lag_v
    pcm = decode_bits(MODE_IDX[mode],
                      [make_frame(mode, v) for v in frames_vals])
    As = all_zero_as(mode, fi + 1)
    ch = LowChain()
    excs = []
    for k in range(nsf + 1):
        e, _ = ch.fit_exc(As[k], pcm[40 * k: 40 * (k + 1)])
        excs.append(np.asarray(e))
    target = excs[nsf]
    hist = np.zeros(280)
    for e in excs[:nsf]:
        fb = np.trunc(e * 16384.0) / 16384.0
        hist = np.concatenate([hist[40:], fb])
    code0 = L.pulses_mode(mode, sf, RICH_PULSES[mode], 0)
    dcols = [np.convolve(code0, L.IR_FILTERS[k])[:40] for k in range(3)]
    best = (None, None, np.inf)
    second = np.inf
    for T0 in range(17, 150):
        for frac in (-1, 0, 1):
            v = L.pred_lt_6(hist, T0, 2 * frac)
            cols = [v, code0] + dcols
            if T0 < 40:
                shifted = np.zeros(40)
                shifted[T0:] = code0[:40 - T0]
                cols.append(shifted)
            A = np.stack(cols, axis=1)
            x, res, *_ = np.linalg.lstsq(A, target, rcond=None)
            r = float(np.linalg.norm(A @ x - target))
            if r < best[2]:
                second = best[2]
                best = (T0, frac, r)
            elif r < second:
                second = r
    T0, frac, r = best
    scale = float(np.linalg.norm(target))
    return ("|".join(map(str, (mode, fi, sf, prev_abs_idx, lag_v))),
            dict(T0=T0, frac=frac, resid=r / max(scale, 1e-12),
                 margin=float(second / max(r, 1e-15))))


def main():
    jobs = []
    spec = sys.argv[1] if len(sys.argv) > 1 else "all"
    # absolute law: 5k9 frame-2 sf2 (8 bits; 240-sample history covers
    # every T0), full sweep
    if spec in ("all", "abs"):
        for v in range(256):
            jobs.append(("5k9", 1, 2, None, v))
    # relative laws at frame-2 sf3 (prev abs on sf2 decodes by the
    # pinned absolute law): sweep (prev_abs_idx, rel index)
    if spec in ("all", "rel"):
        for prev in (0, 30, 100, 160, 196, 217, 255):
            for v in range(16):    # 4-bit (5k9 sf3; shared 4k75/5k15/6k7)
                jobs.append(("5k9", 1, 3, prev, v))
            for v in range(32):    # 5-bit (7k4 sf3; shared 10k2)
                jobs.append(("7k4", 1, 3, prev, v))
            for v in range(64):    # 6-bit (7k95 sf3)
                jobs.append(("7k95", 1, 3, prev, v))
    print(f"{len(jobs)} probes")
    results = {}
    with ProcessPoolExecutor(max_workers=16) as ex:
        for key, out in ex.map(probe_one, jobs, chunksize=4):
            results[key] = out
    path = os.path.join(HERE, "learned", "low_lag_probes.json")
    json.dump(results, open(path, "w"), indent=0)
    bad = {k: v for k, v in results.items()
           if v["resid"] > 1e-3 or v["margin"] < 10}
    print(f"saved {path}; {len(bad)} low-confidence probes")
    for k, v in list(bad.items())[:10]:
        print(" ", k, v)


if __name__ == "__main__":
    main()
