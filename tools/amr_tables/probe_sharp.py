"""Pin the MR122 pitch-sharpening law: frame 1, subframe 0, zero history
(v=0), code = +2 pulses at positions 0..4 (all position/sign bits 0).
Then exc = gc * sharpened(code) and the ratio exc[T0+j]/exc[j] reads the
sharpening factor beta directly. Sweep gp index and T0."""

from __future__ import annotations

import numpy as np

import amrnb_dec as D
import extract_exc as X
import oracle


def mk_bits(lag_idx=0, gp_idx=0, gc_idx=20):
    bits = [0] * 244
    for b, v in zip(D.LAG_BITS[0],
                    format(lag_idx, f"0{len(D.LAG_BITS[0])}b")):
        bits[b] = int(v)
    for b, v in zip(D.GP_BITS[0], format(gp_idx, "04b")):
        bits[b] = int(v)
    for i in range(4):
        for b, v in zip(D.GC_BITS[i], format(gc_idx, "05b")):
            bits[b] = int(v)
    return bits


def lag_index_for(T0, frac=0):
    # invert dec_lag6_abs: index = (T0-17)*6 + frac - 3  (for index < 463)
    return (T0 - 17) * 6 + frac - 3


def extract_sf0(bits):
    ref = oracle.decode_bits(7, [bits])
    d = D.MR122Decoder()
    lsf1, _ = d.lsf_decode(list(bits))
    from refit_bad import hz_to_cos, lsp_to_a
    init = np.array([30000, 26000, 21000, 15000, 8000, 0, -8000,
                     -15000, -21000, -26000]) / 32768.0
    l1 = hz_to_cos(lsf1)
    a = lsp_to_a(np.sort(0.5 * init + 0.5 * l1)[::-1])
    inv = X.ChainInverter()
    e, r = inv.fit_exc(a, ref[:40])
    return e, r


def main():
    print("=== beta vs gp index (T0=20, frac=0) ===")
    li = lag_index_for(20)
    for gp_idx in range(16):
        bits = mk_bits(lag_idx=li, gp_idx=gp_idx)
        e, r = extract_sf0(bits)
        base = e[0:5]
        echo = e[20:25]
        beta = float(np.mean(echo / base))
        spread = float(np.std(echo / base))
        print(f" gp_idx={gp_idx:2d} gp={D.QUA_GAIN_PITCH[gp_idx]:.4f} "
              f"beta={beta:.6f} (+-{spread:.1e}) gc_amp={base[0]/2:.6e} "
              f"resid={r:.1e}")
    print("=== beta vs T0 (gp_idx=15) ===")
    for T0 in (18, 20, 25, 33, 39, 40, 41):
        li = lag_index_for(T0) if T0 < 95 else None
        bits = mk_bits(lag_idx=li, gp_idx=15)
        e, r = extract_sf0(bits)
        if T0 < 40:
            beta = float(np.mean(e[T0:T0 + 5] / e[0:5]))
        else:
            beta = float(np.abs(e[5:]).max() / e[0])
        print(f" T0={T0} beta={beta:.6f} gc_amp={e[0]/2:.6e} resid={r:.1e}")


if __name__ == "__main__":
    main()
