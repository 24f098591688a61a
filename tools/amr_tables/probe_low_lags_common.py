"""Shared helpers for the low-mode lag/gain probe scripts."""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import amrnb_low as L  # noqa: E402


def all_zero_as(mode, n_frames):
    """Replica LP sets for an all-zero-LSF stream of n_frames (the LSF
    chain is exact at index 0 — probe_low_zero.py)."""
    past_r = np.zeros(10)
    past_lsp = L.LSP_INIT.copy()
    As = []
    for _ in range(n_frames):
        lsf_q, r = L.lsf_decode_3(mode, 0, 0, 0, past_r)
        past_r = r
        lsp_new = L.hz_to_cos(L.reorder_lsf(lsf_q))
        for k in range(4):
            w = (k + 1) / 4.0
            lsp = (1.0 - w) * past_lsp + w * lsp_new
            As.append(L.lsp_to_a(np.sort(lsp)[::-1]))
        past_lsp = lsp_new
    return As


def gain_row(mode):
    """Gain row with max gc correction subject to small gp (keeps the
    adaptive/sharpening contamination of non-probe subframes low while
    making the history pulses large against feedback truncation)."""
    if mode in ("5k15", "5k9"):
        T = L.GAINS_LOW
    elif mode in ("6k7", "7k4", "10k2"):
        T = L.GAINS_HIGH
    elif mode == "4k75":
        G = L.GAINS_MR475
        ok = np.where(np.maximum(G[:, 0], G[:, 2]) < 3000)[0]
        return int(ok[np.argmax(np.minimum(G[ok, 1], G[ok, 3]))])
    else:  # 7k95: scalar gains; gp index 0 -> pitch gain 0
        return 0
    ok = np.where(T[:, 0] < 3000)[0]
    return int(ok[np.argmax(T[ok, 1])])
