"""Pin the phase-dispersion row-selection law (the last un-pinned
decoder-side stage of the low modes).

Method: decode random streams with the oracle; run the replica in
lock-step, and at every subframe try the candidate synthesis
excitations {undispersed, ir row 0/1/2} x {emphasis on/off} against
the oracle output segment (chain + HP run on CLONED filter state).
Commit the best candidate so states stay in sync, and log
(mode, sf, gp, gc, chosen) tuples to learn the selection rule.

Usage: python probe_disp_rows.py [mode] [n_streams] [n_frames]
"""

from __future__ import annotations

import copy
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import amrnb_low as L  # noqa: E402
import replica  # noqa: E402
from fit_frame import HPG, HPP  # noqa: E402
from oracle import decode_bits  # noqa: E402
from verify_low_decoder import FRAME_BITS  # noqa: E402

HPB = np.array([1.0, -2.0, 1.0]) * HPG
HPA = np.asarray(HPP)


def run_stream(mode, seed, n_frames, records):
    rng = np.random.default_rng(seed)
    frames = [list(rng.integers(0, 2, FRAME_BITS[mode]))
              for _ in range(n_frames)]
    ref = decode_bits(L.MODE_IDX[mode], frames)
    ctr = dict(sf=0)

    def hook(dec, k, info):
        seg = ref[40 * ctr["sf"]: 40 * ctr["sf"] + 40]
        gp, gc, v, code = info["gp"], info["gc"], info["v"], info["code"]
        cands = []
        for row in (None, 0, 1, 2):
            c2 = code if row is None else L.disp_circular(code, row)
            e = gp * v + gc * c2
            for emph in (False, True):
                if emph:
                    if gp <= 0.5:
                        continue
                    e0 = float(np.dot(e, e))
                    pf = 0.5 * gp * min(gp, L.SHARP_MAX)
                    e2 = e + pf * v
                    s2 = float(np.dot(e2, e2))
                    ee = e2 * np.sqrt(e0 / s2) if s2 > 0 else e
                else:
                    ee = e
                st = copy.deepcopy(dec.st_chain)
                hp = list(dec.hp)
                y = replica.subframe_chain(ee, info["a"], st,
                                           **L.LOW_CHAIN)
                o, _ = replica.hp_biquad(y, HPB, HPA, hp)
                err = float(np.dot(o - seg, o - seg))
                cands.append((err, row, emph, ee))
        cands.sort(key=lambda t: t[0])
        err, row, emph, ee = cands[0]
        p = float(np.dot(seg, seg))
        snr = 10.0 * np.log10(p / err) if err > 0 and p > 0 else 99.0
        second = cands[1][0] / max(err, 1e-30) if len(cands) > 1 else 0
        records.append(dict(
            mode=mode, seed=seed, sf=ctr["sf"], row=row, emph=emph,
            snr=round(snr, 1), margin=round(float(second), 2),
            gp=round(gp, 4), gc=round(gc, 5),
            ecode=round(float(np.dot(code, code)), 2)))
        ctr["sf"] += 1
        return ee

    dec = L.LowDecoder(mode, disp_hook=hook)
    for b in frames:
        dec.decode_frame(b)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "7k4"
    n_streams = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    records = []
    for i in range(n_streams):
        run_stream(mode, 2000 + i, n_frames, records)
    json.dump(records, open(os.path.join(
        HERE, "learned", f"disp_probes_{mode}.json"), "w"))
    # summary: chosen row vs gp bucket
    rows = {}
    for r in records:
        key = (r["row"], r["emph"])
        rows.setdefault(key, []).append(r)
    for key in sorted(rows, key=lambda k: (str(k[0]), k[1])):
        rs = rows[key]
        gps = [r["gp"] for r in rs]
        snrs = [r["snr"] for r in rs]
        print(f"row={key[0]} emph={key[1]}: n={len(rs)} "
              f"gp[{min(gps):.2f},{max(gps):.2f}] "
              f"snr med {np.median(snrs):.1f} min {min(snrs):.1f}")
    low = [r for r in records if r["snr"] < 20]
    print(f"{len(low)}/{len(records)} subframes below 20 dB fit")
    for r in low[:12]:
        print("  ", r)


if __name__ == "__main__":
    main()
