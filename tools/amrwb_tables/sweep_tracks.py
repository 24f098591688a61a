"""Sweep the 512 values of each code track under a clean LTI protocol.

Protocol (fixes the two confounds found by probe_lag0_echo.py and the
first banked sweep):
- frame 1 is ALL-ZERO: its code cancels (silence), so the adaptive
  history stays zero, and it pins the ISF MA state so that frame 2's
  interpolated LP is IDENTICAL in all four subframes -> the chain is
  LTI over the whole 160-sample window.
- frame 2 carries the probe: sf0 lag index 120 (storage bits
  {12,13,14,46}) puts T0_int >= 64, disabling the 0.85
  pitch-sharpening echo; sf0 gain index 114 is the loudest code row
  (100x over row 0, far above the deterministic high-band noise
  floor); one track's 9 bits swept 0..511.
- the banked response is frame2's [0:160] minus the v=0 base, so the
  noise floor and any code-independent component cancel.

Track bit sets (storage positions, MSB-first as swept):
  T0 {109,125,129,157,161,189,193,221,225}
  T1 {110,133,137,165,169,197,201,229,233}
  T2 {111,141,145,173,177,205,209,237,241}
  T3 {112,149,153,181,185,213,217,245,249}
"""

import os
import sys

import numpy as np

import wb

HERE = os.path.dirname(os.path.abspath(__file__))
TRACKS = [
    [109, 125, 129, 157, 161, 189, 193, 221, 225],
    [110, 133, 137, 165, 169, 197, 201, 229, 233],
    [111, 141, 145, 173, 177, 205, 209, 237, 241],
    [112, 149, 153, 181, 185, 213, 217, 245, 249],
]
LAG_ECHO_FREE = [12, 13, 14, 46]   # sf0 abs lag index 120 -> T0_int >= 64
GAIN0 = [3, 20, 42, 28, 32, 38, 24]  # sf0 gain bits MSB-first (FACTS)
GAIN_LOUD = 114


def probe_frame(track, v):
    bits = [0] * wb.BITS
    for b in LAG_ECHO_FREE:
        bits[b] = 1
    for i, b in enumerate(GAIN0):
        if (GAIN_LOUD >> (6 - i)) & 1:
            bits[b] = 1
    for i, b in enumerate(TRACKS[track]):
        if (v >> (8 - i)) & 1:
            bits[b] = 1
    return bits


def decode_probe(track, v):
    silent = [0] * wb.BITS
    return wb.decode_bits([silent, probe_frame(track, v)])[320:480]


def main():
    track = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    base = decode_probe(track, 0)
    out = np.zeros((512, 160), np.float32)
    for v in range(512):
        out[v] = decode_probe(track, v) - base
        if v % 128 == 0:
            print("...", v, flush=True)
    np.save(os.path.join(HERE, "learned",
                         f"track{track}_sweep_clean.npy"), out)
    print("saved track", track)


if __name__ == "__main__":
    main()
