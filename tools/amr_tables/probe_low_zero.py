"""Bootstrap probe for the low modes: with every bit zero, the LSF
decode is mapping-hypothesis-free (all indices are 0 -> table row 0),
so the replica's predicted frame-1 LP set is exact if the LSF chain
(tables + mean + interpolation) is right. With `a` known, fit_exc is a
LINEAR extraction of the excitation, revealing the all-zero fixed-code
pulse pattern of every mode with no codebook hypothesis at all.

Frame-1 sf0 has no adaptive contribution and no sharpening (previous
gp = 0), so exc_sf0 = gc * disp?(code) exactly.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import amrnb_low as L  # noqa: E402
from modes_lab import LowChain, make_frame, MODE_IDX  # noqa: E402
from oracle import decode_bits  # noqa: E402


def frame1_a(mode, k):
    """Replica-predicted LP for frame 1 subframe k, all-zero LSF."""
    lsf_q, _ = L.lsf_decode_3(mode, 0, 0, 0, np.zeros(10))
    lsp_new = L.hz_to_cos(L.reorder_lsf(lsf_q))
    w = (k + 1) / 4.0
    lsp = (1.0 - w) * L.LSP_INIT + w * lsp_new
    return L.lsp_to_a(np.sort(lsp)[::-1])


def main():
    modes = sys.argv[1:] or ["4k75", "5k15", "5k9", "6k7", "7k4",
                             "7k95", "10k2"]
    for mode in modes:
        pcm = decode_bits(MODE_IDX[mode], [make_frame(mode, {})])
        ch = LowChain()
        print(f"=== {mode}")
        for k in range(2):
            a = frame1_a(mode, k)
            exc, r = ch.fit_exc(a, pcm[40 * k: 40 * (k + 1)])
            top = np.argsort(-np.abs(exc))[:12]
            top = sorted(int(i) for i in top if abs(exc[i]) >
                         0.02 * np.abs(exc).max())
            print(f"  sf{k} fit_resid={r:.2e} "
                  f"exc_max={np.abs(exc).max():.3e}")
            print(f"    support: "
                  + ", ".join(f"{i}:{exc[i]/np.abs(exc).max():+.3f}"
                              for i in top))


if __name__ == "__main__":
    main()
