"""Bisect the remaining MR122 excitation-domain hypotheses: extract the
oracle's exact excitation per subframe (ChainInverter) and compare against
the replica decoder's SYNTHESIS excitation, decomposing the error onto the
adaptive vector v and (sharpened) fixed code c: exc_oracle ~= gp*v + gc*c.

Uses the decoder's own trace hook so the probe can never drift from
amrnb_dec.py's actual decode."""

from __future__ import annotations

import numpy as np

import amrnb_dec as D
import extract_exc as X
import oracle


def replica_trace(frames):
    rec = []
    d = D.MR122Decoder(trace=rec)
    outs = [d.decode_frame(b) for b in frames]
    return np.concatenate(outs), rec


def main(n_trials=4, seed=1, n_frames=1):
    rng = np.random.default_rng(seed)
    for t in range(n_trials):
        frames = [rng.integers(0, 2, 244).tolist() for _ in range(n_frames)]
        ref = oracle.decode_bits(7, frames)
        _, rec = replica_trace(frames)
        # extract oracle excitation using the replica's As (known-good LSF)
        inv = X.ChainInverter()
        print(f"=== trial {t}")
        for n, r in enumerate(rec):
            tgt = ref[40 * n: 40 * (n + 1)]
            e_or, resid = inv.fit_exc(r["a"], tgt, exc0=r["exc_syn"])
            err = e_or - r["exc_syn"]
            # LS decomposition onto [v, code_sharpened]
            M = np.stack([r["v"], r["code"]], 1)
            sol, *_ = np.linalg.lstsq(M, e_or, rcond=None)
            fit = M @ sol
            onto = float(np.abs(e_or - fit).max())
            print(f" sf{n}: fit_resid={resid:.1e}"
                  f" exc_err={np.abs(err).max():.3e}"
                  f" |exc|={np.abs(r['exc_syn']).max():.3e}"
                  f" T0={r['T0']} frac={r['frac']} lag={r['lag_idx']}"
                  f" gp={r['gp']:.4f}/{sol[0]:.4f}"
                  f" gc={r['gc']:.5f}/{sol[1]:.5f} onto_resid={onto:.2e}")


if __name__ == "__main__":
    import sys
    nt = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    nf = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    main(nt, n_frames=nf)
