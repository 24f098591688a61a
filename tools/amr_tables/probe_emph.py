"""Pin the exact MR122 pitch-emphasis law. For subframes where the
oracle excitation lies exactly in span{v, code}, recover the oracle's
effective (gp_eff, gc_eff) by LS and compare with candidate laws:

  A: exc_syn = s * ((gp + 0.25*gp*min(gp,1))*v + gc*c),
     s = sqrt(E0/E1), E0 = |gp v + gc c|^2, E1 = |emphasized|^2
  report implied s_gp = gp_eff/(gp+pf), s_gc = gc_eff/gc and the
  candidate's predictions so the true energy-measure can be identified.
"""

from __future__ import annotations

import numpy as np

import amrnb_dec as D
import extract_exc as X
import oracle
from probe_exc2 import replica_trace


def main(n_trials=6, seed=1):
    rng = np.random.default_rng(seed)
    for t in range(n_trials):
        frames = [rng.integers(0, 2, 244).tolist()]
        ref = oracle.decode_bits(7, frames)
        _, rec = replica_trace(frames)
        inv = X.ChainInverter()
        for n, r in enumerate(rec):
            gp, gc = r["gp"], r["gc"]
            if gp <= 0.5 or np.abs(r["v"]).max() < 1e-9:
                continue
            tgt = ref[40 * n: 40 * (n + 1)]
            e_or, resid = inv.fit_exc(r["a"], tgt, exc0=r["exc_syn"])
            M = np.stack([r["v"], r["code"]], 1)
            sol, *_ = np.linalg.lstsq(M, e_or, rcond=None)
            onto = float(np.abs(e_or - M @ sol).max())
            if onto > 1e-3 * np.abs(e_or).max():
                continue  # contaminated by upstream error
            pf = gp * 0.25 * min(gp, 1.0)
            s_gp = sol[0] / (gp + pf)
            s_gc = sol[1] / gc
            exc = r["exc"]
            e2 = exc + pf * r["v"]
            s_pred = np.sqrt(np.dot(exc, exc) / np.dot(e2, e2))
            print(f"t{t} sf{n}: gp={gp:.4f} gc={gc:.5f} "
                  f"gp_eff={sol[0]:.5f} gc_eff={sol[1]:.6f} "
                  f"s_gp={s_gp:.5f} s_gc={s_gc:.5f} s_pred={s_pred:.5f} "
                  f"onto={onto:.1e}")


if __name__ == "__main__":
    main()
