"""Per-bit ISF coordinate profiles: flip each of the 46 ISF bits alone
and fit the resulting ISF delta (free 16 coords, time-domain fitter).
The nonzero coordinates partition the bits into the 7 MSVQ fields and
give each field's coordinate span — replacing the round-3
nonadditivity clustering, which misassigned some stage-2 bits.
"""

import json
import os

import numpy as np

import wb
import isf_lab as L
import isf_param as P
import scan_isf as S

HERE = os.path.dirname(os.path.abspath(__file__))
ISF_BITS = sorted(set(b for f in L.FIELDS.values() for b in f))


def main():
    a_base = S.base_fit()
    a16b, _ = S.deemph_deconv(a_base)
    isf_base = P.a_to_isf(a16b)
    rbase = S.burst({}, 0)

    def burst_bit(bit):
        fr = L.probe_frames({}, warm=3)
        frames = [list(x) for x in fr]
        for x in frames:
            x[bit] = 1
        return wb.decode_bits(frames)[960:1280]

    rows = {}
    for bit in ISF_BITS:
        rI = S._lp320(burst_bit(bit))
        a_ar = S.ar_fit(burst_bit(bit))
        a16a, _ = S.deemph_deconv(a_ar)
        init = (P.a_to_isf(a16a) - isf_base)
        x, rel = S.fit_time(rbase, rI, isf_base, list(range(16)), init)
        rows[bit] = dict(delta=[round(float(v), 1) for v in x[:16]],
                         rel=round(rel, 4))
        d = np.abs(x[:16])
        top = [int(c) for c in np.argsort(-d)[:5] if d[c] > 0.25 * d.max()]
        print(f"bit {bit:3d} rel {rel:.3f} coords {sorted(top)} "
              f"delta {np.round(x[:16], 0)}", flush=True)
    with open(os.path.join(HERE, "learned", "isf_bit_profiles.json"),
              "w") as f:
        json.dump(rows, f)


if __name__ == "__main__":
    main()
