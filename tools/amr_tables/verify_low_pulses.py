"""Exhaustively check amrnb_low.pulses_mode against every probe in
learned/low_pulse_probes.json (all modes, subframes, position AND sign
fields). A probe matches when the predicted pulse pattern equals the
measured support: same positions, same relative signs (the overall
extraction sign is fixed by the sign-field-0 convention: all pulses
negative)."""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import amrnb_low as L  # noqa: E402


def support_of(code):
    idx = np.where(code != 0)[0]
    return sorted((int(i), float(np.sign(code[i]))) for i in idx)


def main():
    R = json.load(open(__file__.rsplit("/", 1)[0]
                       + "/learned/low_pulse_probes.json"))
    n_ok = n_bad = 0
    for key, v in R.items():
        mode, sf, fname, val = key.split("|")
        sf, val = int(sf), int(val)
        pos_v, sig_v = (val, 0) if fname == "pulse0" else (0, val)
        code = L.pulses_mode(mode, sf, pos_v, sig_v)
        exp = support_of(code)
        # measured support: positions with |amp| ~ 1 (pulses may overlap:
        # two pulses at one position give amp 2 -> normalized 1, the
        # other 0.5)
        sup = v["support"]
        m = max(abs(a) for _, a in sup)
        got = sorted((p, float(np.sign(a))) for p, a in sup
                     if abs(a) > 0.4 * m)
        # collapse overlapping predicted pulses (sum amplitudes)
        agg = {}
        for p, s in exp:
            agg[p] = agg.get(p, 0.0) + s
        exp_c = sorted((p, np.sign(s)) for p, s in agg.items() if s != 0)
        if got == exp_c:
            n_ok += 1
        else:
            n_bad += 1
            if n_bad <= 10:
                print(f"MISMATCH {key}: got {got} exp {exp_c}")
    print(f"{n_ok} ok, {n_bad} mismatches")
    assert n_bad == 0


if __name__ == "__main__":
    main()
