"""Read the true MR122 lag decode by locating sharpening echoes: frame 1,
sf0, gp_idx=15 (beta clipped to 1), code pulses at 0..4, sweep lag index;
the echo position in the extracted excitation IS the decoded integer T0
(or shows fractional structure)."""

from __future__ import annotations

import numpy as np

from probe_sharp import extract_sf0, mk_bits


def show(lag_idx, gp_idx=15):
    bits = mk_bits(lag_idx=lag_idx, gp_idx=gp_idx)
    e, r = extract_sf0(bits)
    base = e[0]
    nz = [(i, round(float(e[i] / base), 4)) for i in range(40)
          if abs(e[i]) > 1e-3 * abs(base)]
    print(f"lag_idx={lag_idx:3d}: resid={r:.0e} exc/base: {nz}")


if __name__ == "__main__":
    import sys
    idxs = ([int(a) for a in sys.argv[1:]] if len(sys.argv) > 1
            else [0, 1, 2, 3, 4, 5, 6, 9, 12, 15, 21, 45, 48, 51])
    for i in idxs:
        show(i)
