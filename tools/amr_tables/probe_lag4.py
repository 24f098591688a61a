"""Per-bit significance mapping of BOTH MR122 absolute lag fields.

Trial-3 of probe_dec proved the odd/even interleave assumption wrong in a
way invisible to whole-field probes (they invert the same assumed map on
write and read). This probe sets ONE storage bit at a time over the lag
block {29..46} (+ the relative-field bits) and measures:

  sf0: the in-subframe sharpening echo position (code[n] += beta*code[n-T0]
       for T0 < 40, beta=min(gp,1)) read from the extracted sf0 excitation
       -> T0 integer directly, for significances up to 128;
       plus the sf1-window method for the 256 bit.
  sf2: full-range (T0, frac) fit of sf2's adaptive vector against history
       built from sf0+sf1 (pulse cluster in sf0).

A bit that belongs to neither field leaves the default decode (T0=17).
"""

from __future__ import annotations

import numpy as np

import amrnb_dec as D
import extract_exc as X
import oracle
import probe_rel as R
from refit_bad import hz_to_cos, lsp_to_a


def extract_sfs(bits, n_sf):
    return R.extract_n(bits, n_sf)


def sf0_echo_T0(bits):
    """sf0 code = pulses at 0..4 (+2 each); echo at T0..T0+4 if T0<40."""
    (e0, r0), = R.extract_n(bits, 1)
    # base pulses at 0..4 have amplitude gc*2; echo amplitude beta*that
    base = np.abs(e0[:5]).mean()
    cand = None
    for T0 in range(17, 40):
        seg = e0[T0:T0 + 5]
        if len(seg) == 5 and np.abs(seg).min() > 0.3 * base:
            cand = T0
            break
    return cand, float(base)


def probe_sf0():
    print("== sf0 field per-bit (echo method; default no-echo means T0>=40"
          " or bit not in field; idx0 -> T0=17)")
    for p in range(29, 47):
        bits = R.mk(sf1_idx=0, gp=(11, 0, 0, 0), gc=(31, 0, 0, 0))
        R.write_field(bits, D.LAG_BITS[0], 0)
        bits[p] = 1
        T0, base = sf0_echo_T0(bits)
        print(f" bit {p}: echo T0={T0} (base={base:.2e})", flush=True)


def probe_sf2():
    print("== sf2 field per-bit (adaptive fit; bit not in field -> T0=17)")
    code = R.code_base()
    for p in list(range(29, 47)) + [242, 243]:
        bits = R.mk(sf1_idx=0, sf2_idx=0, gp=(0, 0, 11, 0),
                    gc=(31, 0, 0, 0))
        R.write_field(bits, D.LAG_BITS[0], 0)
        R.write_field(bits, D.LAG_BITS[2], 0)
        bits[p] = 1
        ex = R.extract_n(bits, 3)
        e0, e1, e2 = [e for e, _ in ex]
        hist = np.concatenate([np.zeros(74), e0, e1])
        b = R.best_lag(e2, hist, code, range(17, 100))
        print(f" bit {p}: sf2 (T0,frac)=({b[1]},{b[2]:+d}) gp={b[3]:.4f} "
              f"resid={b[0]:.1e}", flush=True)


if __name__ == "__main__":
    import sys
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    if what in ("sf0", "both"):
        probe_sf0()
    if what in ("sf2", "both"):
        probe_sf2()
