"""Identify the MR122 lag-field bit significance by single-bit probes.

Frame 1, LSF bits 0, code pulses +2 at 0..4 every subframe, gp_idx=15 on
all subframes (sharpening beta=1). Extract the exact excitation of all 4
subframes; report echo supports. sf0's sharpening echo reads its T0 in
[18,39]; sf1..3 read lags via the adaptive vector hitting the previous
subframes' pulse clusters."""

from __future__ import annotations

import numpy as np

import amrnb_dec as D
import extract_exc as X
import oracle
from refit_bad import hz_to_cos, lsp_to_a


def mk_bits(set_bits=(), gp=(15, 15, 15, 15), gc_idx=20):
    bits = [0] * 244
    for k in range(4):
        for b, v in zip(D.GP_BITS[k], format(gp[k], "04b")):
            bits[b] = int(v)
        for b, v in zip(D.GC_BITS[k], format(gc_idx, "05b")):
            bits[b] = int(v)
    for b in set_bits:
        bits[b] = 1
    return bits


def extract4(bits):
    ref = oracle.decode_bits(7, [bits])
    d = D.MR122Decoder()
    lsf1, lsf2 = d.lsf_decode(list(bits))
    init = np.array([30000, 26000, 21000, 15000, 8000, 0, -8000,
                     -15000, -21000, -26000]) / 32768.0
    l1, l2 = hz_to_cos(lsf1), hz_to_cos(lsf2)
    lsps = [0.5 * init + 0.5 * l1, l1, 0.5 * l1 + 0.5 * l2, l2]
    inv = X.ChainInverter()
    out = []
    for k in range(4):
        a = lsp_to_a(np.sort(lsps[k])[::-1])
        e, r = inv.fit_exc(a, ref[40 * k: 40 * (k + 1)])
        out.append((e, r))
    return out


def describe(e, thresh=0.02):
    m = np.abs(e).max()
    if m < 1e-9:
        return "~0"
    idx = [i for i in range(40) if abs(e[i]) > thresh * m]
    # compress consecutive runs
    runs, s = [], None
    for i in idx:
        if s is None:
            s = p = i
        elif i == p + 1:
            p = i
        else:
            runs.append((s, p))
            s = p = i
    if s is not None:
        runs.append((s, p))
    amps = [round(float(e[a] / e[idx[0]]), 3) for a, b in runs]
    return " ".join(f"{a}-{b}({g})" for (a, b), g in zip(runs, amps))


LAG_SET = (list(range(29, 47)) + list(range(71, 81)) + [242, 243])


def main(bits_to_probe=None):
    probes = [("base", [])]
    for b in (bits_to_probe or LAG_SET):
        probes.append((f"bit{b}", [b]))
    for name, sb in probes:
        ex = extract4(mk_bits(set_bits=sb))
        desc = " | ".join(f"sf{k}: {describe(e)}" for k, (e, r) in
                          enumerate(ex))
        rmax = max(r for _, r in ex)
        print(f"{name:>6} (r={rmax:.0e}): {desc}", flush=True)


if __name__ == "__main__":
    import sys
    bl = [int(a) for a in sys.argv[1:]] or None
    main(bl)
