"""Calibration probes for the AMR-WB 12.65k codec model.

1. MA predictor factor mu: decode ...,0,0,I,0+burst,...; the burst
   frame's ISF = base16 + mu*Delta(I), so comparing with the banked
   Delta tables reads mu directly (per coordinate, should be constant).

2. ISF interpolation weights per subframe: ...,0,0,I+burst_sf{k},...;
   subframe k's ISF = base16 + w_k*Delta(I); w_k = the interpolation
   weight of the NEW isf in subframe k (w_3 ~ 1 by the v3 scan design).

3. Fixed-gain predictor: the burst amplitude depends on the previous
   frames' gain indices through the MA energy predictor. Sweep the
   warm frames' sf gain rows; measure the burst scale ratio ->
   predictor memory shape and per-row correction values.
"""

from __future__ import annotations

import json
import os

import numpy as np

import wb
import isf_lab as L
import isf_param as P
import scan_isf as S
import scan_isf2 as S2
import scan_isf3 as S3

HERE = os.path.dirname(os.path.abspath(__file__))


def isf_of_frames(frames, sfwin=(240, 400)):
    out = wb.decode_bits(frames)
    start = 320 * (len(frames) - 2) + sfwin[0]
    r = out[start: start + (sfwin[1] - sfwin[0])]
    h = L.resample_to_128(r, int((sfwin[1] - sfwin[0]) * 0.75))
    o = 17
    rows = range(30, len(h))
    M = np.array([[h[t - k] for k in range(1, o + 1)] for t in rows])
    y = np.array([h[t] for t in rows])
    a, _, _, _ = np.linalg.lstsq(M, -y, rcond=None)
    a16, _ = S.deemph_deconv(np.concatenate([[1.0], a]))
    return P.a_to_isf(a16)


def burst_frame(assign, sf=3, code_bit=None):
    bits = L.isf_bits(assign)
    for i, b in enumerate(S2.LAG_SF0):
        if (300 >> (8 - i)) & 1:
            bits[b] = 1
    for i, b in enumerate(S2.LAG_SF2):
        if (300 >> (8 - i)) & 1:
            bits[b] = 1
    for i, b in enumerate(L.GAIN0):
        if (L.GAIN_LOUD >> (6 - i)) & 1:
            bits[b + sf] = 1
    bits[code_bit if code_bit is not None else [109, 113, 117, 121][sf]] = 1
    return bits


def probe_mu(z):
    """frames: 4x zero, I, burst(index 0) -> isf = base + mu*Delta(I)."""
    for f, idx in (("f1a", 255), ("f1b", 128), ("f1a", 17)):
        d_true = z[f"delta_{f}"][idx]
        frames = ([L.isf_bits({})] * 3 + [L.isf_bits({f: idx})]
                  + [burst_frame({})] + [L.isf_bits({})])
        isf = isf_of_frames(frames[:-1] + [frames[-1]],
                            sfwin=(240, 400))
        base_frames = ([L.isf_bits({})] * 4 + [burst_frame({})]
                       + [L.isf_bits({})])
        isf0 = isf_of_frames(base_frames[:-1] + [base_frames[-1]],
                             sfwin=(240, 400))
        dd = isf - isf0
        sel = np.abs(d_true) > 150
        mu = dd[sel] / d_true[sel]
        print(f"mu via {f}={idx}: per-coord {np.round(mu, 3)} "
              f"median {np.median(mu):.4f}")


def probe_interp(z):
    """Per-subframe weights of the NEW isf inside its own frame."""
    windows = {0: (0, 160), 1: (80, 240), 2: (160, 320), 3: (240, 400)}
    for f, idx in (("f1a", 255), ("f1b", 128)):
        d_true = z[f"delta_{f}"][idx]
        sel = np.abs(d_true) > 150
        for sf in range(4):
            win = windows[sf]
            frames = ([L.isf_bits({})] * 4
                      + [burst_frame({f: idx}, sf=sf)]
                      + [L.isf_bits({f: idx})])
            isf = isf_of_frames(frames, sfwin=win)
            frames0 = ([L.isf_bits({})] * 4 + [burst_frame({}, sf=sf)]
                       + [L.isf_bits({})])
            isf0 = isf_of_frames(frames0, sfwin=win)
            w = (isf - isf0)[sel] / d_true[sel]
            print(f"interp {f}={idx} sf{sf}: w median {np.median(w):.3f}"
                  f" per-coord {np.round(w, 2)}")


def probe_gain_pred():
    """Burst scale vs previous-frame gain rows."""
    def burst_scale(warm_rows):
        frames = []
        for row in warm_rows:
            bits = [0] * wb.BITS
            for sf in range(4):
                for i, b in enumerate(L.GAIN0):
                    if (row >> (6 - i)) & 1:
                        bits[b + sf] = 1
            frames.append(bits)
        frames.append(burst_frame({}, sf=0))
        out = wb.decode_bits(frames)
        start = 320 * len(warm_rows)
        return float(np.linalg.norm(out[start: start + 120]))

    base = burst_scale([0, 0, 0, 0])
    rows = {}
    for row in (0, 10, 32, 64, 100, 114, 127):
        for pos in range(4):
            wr = [0, 0, 0, 0]
            wr[pos] = row
            s = burst_scale(wr)
            rows[f"row{row}_at{pos}"] = s / base
        print(f"gain row {row} in warm frame k: "
              f"{[round(rows[f'row{row}_at{p}'] , 4) for p in range(4)]}",
              flush=True)
    with open(os.path.join(HERE, "learned", "gain_pred_probe.json"),
              "w") as fj:
        json.dump(rows, fj)


if __name__ == "__main__":
    z = np.load(os.path.join(HERE, "learned", "isf_tables.npz"))
    probe_mu(z)
    probe_interp(z)
    probe_gain_pred()
