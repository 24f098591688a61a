"""Verify the recovered 2-pulse track coding law of the AMR-WB 12.65k
algebraic codebook against the clean 512-value sweeps of all 4 tracks
(learned/track{t}_sweep_clean.npy, produced by sweep_tracks.py).

Recovered law (storage bits per track listed MSB-first in
sweep_tracks.TRACKS; v denotes the swept 9-bit value, v-bit 8 = first
storage bit of the track):

  A = v-bits {0,2,4,6}  (LSB-first: bit0 -> A's 1s place, bit2 -> 2s, ...)
  B = v-bits {1,3,5,7}  (same significance rule)
  s = v-bit 8
  pulse1: position B, sign sigma = +1 if s else -1
  pulse2: position A, sign sigma if A >= B else -sigma

Position p on track t = 12.8 kHz sample 4p + t (= 1.25*(4p+t) output
samples at 16 kHz).  This is the TS 26.190 quant_2p_2N1 shape (sign of
the second pulse order-derived) with lavc's storage-bit interleave.

The sweep responses are differences vs v=0, whose code is -2@position0
(both pulses coincident negative), so the expected response pattern is
code(v) + 2@pos0.  A global 3-tap shaping FIR (12.8k-domain taps 0,1,2)
is co-fitted to absorb the decoder's tilt filtering of the fixed
vector; it must come out config-independent for the law to be accepted.
"""

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def law(v):
    A = sum(((v >> (2 * i)) & 1) << i for i in range(4))
    B = sum(((v >> (2 * i + 1)) & 1) << i for i in range(4))
    s = (v >> 8) & 1
    sig = 1 if s else -1
    return [(B, sig), (A, sig if A >= B else -sig)]


def main():
    results = {}
    for t in range(4):
        S = np.load(os.path.join(HERE, "learned",
                                 f"track{t}_sweep_clean.npy"))
        # atom: the track's own coincident response. v=256+0 -> +4@pos0
        # in diff units -> atom = S[256]/4 is a unit pulse at (4*0+t).
        h = S[256] / 4.0
        N = 1024
        H = np.fft.rfft(h, N)
        w = np.arange(len(H)) * 2 * np.pi / N

        def shifted(p128):  # shift atom by p128 12.8k samples
            return np.fft.irfft(H * np.exp(-1j * w * 1.25 * p128), N)[:160]

        atoms = {p: shifted(4 * p) for p in range(16)}
        tilt1 = {p: shifted(4 * p + 1) for p in range(16)}
        tilt2 = {p: shifted(4 * p + 2) for p in range(16)}

        rels = []
        taps = []
        for v in range(512):
            pulses = law(v)
            patt = {}
            for p, s_ in pulses + [(0, +1), (0, +1)]:  # + base removal 2@0
                patt[p] = patt.get(p, 0) + s_
            cols = []
            for bank in (atoms, tilt1, tilt2):
                cols.append(sum(a * bank[p] for p, a in patt.items()
                                if a != 0)
                            if any(patt.values()) else np.zeros(160))
            A_ = np.array(cols).T
            r = S[v]
            nr = np.linalg.norm(r)
            if nr < 1e-4:
                ok = not any(patt.values())
                rels.append(0.0 if ok else 1.0)
                continue
            if not any(patt.values()):
                rels.append(1.0)  # predicted silence but response nonzero
                continue
            x, _, _, _ = np.linalg.lstsq(A_, r, rcond=None)
            rels.append(float(np.linalg.norm(r - A_ @ x) / nr))
            taps.append(x)
        rels = np.array(rels)
        taps = np.array(taps)
        results[t] = dict(
            median=float(np.median(rels)), p95=float(np.percentile(rels, 95)),
            max=float(rels.max()),
            tap0=[float(np.median(taps[:, 0])), float(np.std(taps[:, 0]))],
            tap1=[float(np.median(taps[:, 1])), float(np.std(taps[:, 1]))],
            tap2=[float(np.median(taps[:, 2])), float(np.std(taps[:, 2]))],
        )
        print(f"track {t}: relerr median {results[t]['median']:.4f} "
              f"p95 {results[t]['p95']:.4f} max {results[t]['max']:.4f}  "
              f"taps {results[t]['tap0'][0]:.3f}/{results[t]['tap1'][0]:.3f}"
              f"/{results[t]['tap2'][0]:.3f} "
              f"(sd {results[t]['tap0'][1]:.3f}/{results[t]['tap1'][1]:.3f}"
              f"/{results[t]['tap2'][1]:.3f})")
    with open(os.path.join(HERE, "learned", "track_law_verify.json"),
              "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
