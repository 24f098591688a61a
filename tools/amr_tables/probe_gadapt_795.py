"""Map 7k95's fixed-gain adaptation law with DESIGNED streams: every
subframe of every frame carries the same (gp index, gc index, lag,
pulses), so the decoder reaches its adaptation steady state and the
measured gc ratio r = gc_used/gc_decoded traces the adaptor's
transient + steady state as a function of the pitch-gain regime.

Usage: python probe_gadapt_795.py [n_frames]
"""
import sys, json, os
import numpy as np
from concurrent.futures import ProcessPoolExecutor

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import amrnb_low as L
from diag_low_divergence import fit_exc
from diag_low_gains2 import invert_emphasis
from oracle import decode_bits
from verify_low_decoder import FRAME_BITS

L.DISP_ROWMAP["7k95"] = {0: 2, 1: 0}
MODE = "7k95"
NBITS = FRAME_BITS[MODE]


def build_frame(gp_idx, gc_idx, lsf=(11, 22, 33), lag_abs=80, lag_rel=30,
                pos=0b101010101, sign=0b1010):
    F = L.fields(MODE)
    bits = [0] * NBITS

    def put(field, val):
        p = F[field]
        for i, b in enumerate(p):
            bits[b] = (val >> (len(p) - 1 - i)) & 1

    for g in range(3):
        put((f"lsf{g}", -1), lsf[g])
    for k in range(4):
        lp = F[("p_lag", k)]
        put(("p_lag", k), lag_abs if len(lp) == 8 else lag_rel)
        put(("p_gain", k), gp_idx)
        put(("fixed_gain", k), gc_idx)
        put(("pulse0", k), pos)
        put(("pulse1", k), sign)
    return bits


def run(args):
    gp_idx, gc_idx, n_frames = args
    frames = [build_frame(gp_idx, gc_idx) for _ in range(n_frames)]
    ref = decode_bits(L.MODE_IDX[MODE], frames)
    ctr = dict(sf=0)
    rows = []

    def hook(dec, k, info):
        sf = ctr["sf"]; ctr["sf"] += 1
        seg = ref[40 * sf: 40 * sf + 40]
        gp, gc, v, code = info["gp"], info["gc"], info["v"], info["code"]
        exc_true, _ = fit_exc(seg, info["a"], dec.st_chain, dec.hp,
                              info["exc"])
        best = None
        for row in (None, 0, 1, 2):
            c2 = code if row is None else L.disp_circular(code, row)
            A = np.stack([v, c2], 1)
            sol, *_ = np.linalg.lstsq(A, exc_true, rcond=None)
            rel2 = (np.linalg.norm(exc_true - A @ sol)
                    / max(np.linalg.norm(exc_true), 1e-12))
            if best is None or rel2 < best[0]:
                best = (rel2, row, sol)
        rel2, row, sol = best
        rows.append(dict(sf=sf, gp=gp, gc=gc, g1=float(sol[0]),
                         g2=float(sol[1]), rel2=float(rel2), row=row))
        exc_fb = invert_emphasis(exc_true, v, gp)
        dec.exc_hist[-40:] = np.trunc(exc_fb * 16384.0) / 16384.0
        return exc_true

    dec = L.LowDecoder(MODE, disp_hook=hook)
    for b in frames:
        dec.decode_frame(b)
    return dict(gp_idx=gp_idx, gc_idx=gc_idx, rows=rows)


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    jobs = [(gp_idx, 14, n_frames) for gp_idx in range(16)]
    with ProcessPoolExecutor(max_workers=12) as ex:
        out = list(ex.map(run, jobs))
    json.dump(out, open(os.path.join(HERE, "learned",
                                     "gadapt795_sweep.json"), "w"))
    for o in out:
        gp = o["rows"][0]["gp"]
        rs = [r["g2"] / r["gc"] if r["gc"] else 0 for r in o["rows"]]
        print(f"gp_idx {o['gp_idx']:2d} (gp {gp:5.3f}): r = "
              + " ".join(f"{x:5.3f}" for x in rs))


if __name__ == "__main__":
    main()
