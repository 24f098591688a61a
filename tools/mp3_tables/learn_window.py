"""Extract the ISO Layer III synthesis window (table D, 512 taps) from
libmpg123 by linear inversion.

Probe: a granule with a single spectral line i (value 1, global_gain 210)
via count1-B codes (line position = 4*<leading zero-quads> + slot).
Decoder chain: requantize (=1.0 at line i) -> [antialias: identity for
lines away from subband edges] -> IMDCT (36-pt, long sin window, overlap-
add of 18) -> frequency inversion for odd subbands/odd samples ->
polyphase synthesis, which is LINEAR in the 512 window taps D given the
subband sample sequences.  Build the design matrix from our own IMDCT
model and solve least squares; the residual validates the model
conventions.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from packer import probe_stream_mpeg1, mpeg1_frame, SILENT1, BitWriter
from oracle import mpg123_decode

import os
_HERE = os.path.dirname(os.path.abspath(__file__))

SR, KBPS = 32000, 64


def probe_line(line, value_bits=None):
    """Stream with a single unit line in granule 0 of frame index n_lead."""
    j, slot = divmod(line, 4)
    quad = ["1", "1", "1", "1"]
    quad[slot] = "0"          # one's complement: 0 bit -> value 1
    md = "1111" * j + "".join(quad) + "0"   # positive sign
    gr = {"part2_3_length": len(md), "big_values": 0, "global_gain": 210,
          "table_select": [0, 0, 0], "count1table_select": 1,
          "maindata": md}
    return mpg123_decode(probe_stream_mpeg1(SR, KBPS, gr, n_lead=2,
                                            n_tail=3))[0]


def imdct36(X18):
    """ISO long-block IMDCT: x_i = sum_k X_k cos(pi/72 (2i+1+18)(2k+1)),
    windowed by sin(pi/36 (i+1/2))."""
    i = np.arange(36)[:, None]
    k = np.arange(18)[None, :]
    M = np.cos(np.pi / 72 * (2 * i + 1 + 18) * (2 * k + 1))
    x = M @ X18
    return x * np.sin(np.pi / 36 * (np.arange(36) + 0.5))


def subband_sequences(line, n_granules):
    """Subband sample matrix S[t, k] (t = granule*18 + step) for a single
    unit spectral line appearing in granule index 2 (frame 1 of the
    stream = after 2 silent lead frames -> granule 4? lead frames have 2
    granules each: probe granule index = 2*2 = 4)."""
    sb, idx = divmod(line, 18)
    T = n_granules * 18
    S = np.zeros((T, 32))
    X = np.zeros(18)
    X[idx] = 1.0
    x = imdct36(X)
    g0 = 4  # 2 lead frames * 2 granules
    # overlap-add: first 18 windowed samples into granule g0, last 18 into g0+1
    S[g0 * 18:(g0 + 1) * 18, sb] += x[:18]
    S[(g0 + 1) * 18:(g0 + 2) * 18, sb] += x[18:]
    # frequency inversion: odd subband, odd time step (per granule chain:
    # global time index odd)
    if sb % 2 == 1:
        t = np.arange(T)
        S[:, sb] *= np.where(t % 2 == 1, -1.0, 1.0)
    return S


def synthesis_design(S):
    """PCM(t) as a linear map of D[512].
    Standard polyphase synthesis: per time step t (32 samples out):
      v_j = sum_k cos((2k+1)(j+16) pi/64) S[t,k],  j=0..63
      FIFO V of 16 blocks of 64 (most recent first)
      U[i*64+j]    = V_block[2i][j]       j=0..31
      U[i*64+32+j] = V_block[2i+1][32+j]  j=0..31
      out[j] = sum_{i=0..15} D[j + 32*i] * U[j + 32*i]   -- wait: W=U*D,
      out[j] = sum_i W[j + 32 i]
    Returns A with PCM = A @ D."""
    T = S.shape[0]
    jj = np.arange(64)[:, None]
    kk = np.arange(32)[None, :]
    N = np.cos((2 * kk + 1) * (jj + 16) * np.pi / 64)   # (64, 32)
    V_hist = []
    A = np.zeros((T * 32, 512))
    for t in range(T):
        V_hist.insert(0, N @ S[t])
        U = np.zeros(512)
        for i in range(8):
            blk_a = V_hist[2 * i] if 2 * i < len(V_hist) else np.zeros(64)
            blk_b = V_hist[2 * i + 1] if 2 * i + 1 < len(V_hist) else np.zeros(64)
            U[i * 64:i * 64 + 32] = blk_a[:32]
            U[i * 64 + 32:i * 64 + 64] = blk_b[32:]
        # out[j] = sum_i U[j+32i] * D[j+32i]
        for j in range(32):
            idx = j + 32 * np.arange(16)
            A[t * 32 + j, idx] = U[idx]
        if len(V_hist) > 32:
            V_hist.pop()
    return A


def main():
    lines = [2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13,     # subband 0 interior
             20, 21, 22, 23, 24, 25, 26, 27, 28, 29]      # subband 1 interior
    n_granules = 12
    AtA = np.zeros((512, 512))
    Atb = np.zeros(512)
    pairs = []
    for ln in lines:
        pcm = probe_line(ln)
        S = subband_sequences(ln, n_granules)
        A = synthesis_design(S)
        T = min(len(pcm), A.shape[0])
        A, b = A[:T], np.asarray(pcm[:T], np.float64)
        AtA += A.T @ A
        Atb += A.T @ b
        pairs.append((A, b))
    D = np.linalg.solve(AtA + 1e-12 * np.eye(512), Atb)
    num = sum(np.linalg.norm(A @ D - b) ** 2 for A, b in pairs)
    den = sum(np.linalg.norm(b) ** 2 for _, b in pairs)
    rel = (num / den) ** 0.5
    print(f"rel resid {rel:.3e}, D range [{D.min():.4f}, {D.max():.4f}]")
    np.save(_HERE + "/learned/window_D.npy", D)
    print("D[:8] =", np.round(D[:8], 6))
    print("D[254:260] =", np.round(D[254:260], 6))


if __name__ == "__main__":
    main()
