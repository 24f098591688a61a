"""Compare the full MR122 replica (amrnb_dec.py) against the lavc oracle
on random frames; report per-frame/per-subframe error so open hypotheses
can be bisected."""

from __future__ import annotations

import numpy as np

import amrnb_dec as D
import oracle


def run(n_frames=4, n_trials=6, seed=0, report_sf=True):
    rng = np.random.default_rng(seed)
    worst = 0.0
    for t in range(n_trials):
        frames = [rng.integers(0, 2, 244).tolist() for _ in range(n_frames)]
        ref = oracle.decode_bits(7, frames)
        got = D.decode(frames)
        n = min(len(ref), len(got))
        err = np.abs(ref[:n] - got[:n])
        scale = np.maximum(np.abs(ref[:n]), 1e-6)
        rel = err / scale
        print(f"trial {t}: max_abs={err.max():.3e} "
              f"med_rel={np.median(rel):.3e} max_rel={rel.max():.3e}")
        if report_sf:
            for k in range(n // 40):
                e = err[40 * k:40 * (k + 1)].max()
                r = np.abs(ref[40 * k:40 * (k + 1)]).max()
                print(f"   sf{k}: max_abs={e:.3e} ref_max={r:.3e}")
        worst = max(worst, float(rel.max()))
    return worst


if __name__ == "__main__":
    import sys
    nf = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    nt = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    run(nf, nt)
