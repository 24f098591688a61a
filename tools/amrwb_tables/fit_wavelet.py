"""Fit the 12.8 kHz chain wavelet W (and its regularized inverse).

Model: resample_to_12k8(lavc_out_diff) ~= W (x) synth, where synth is
the table-model synthesis (exc -> 1/A16, gains_of units with
kGcBase=1).  W absorbs the systematic bias between the measurement
domain and lavc's true synthesis plus lavc's upsampler as seen through
an ideal downsample.  Fit by ridge LS over probes with DIVERSE ISF
configs (spectral coverage) and code positions.  The inverse Winv
(encoder input conditioning) is computed by regularized FFT inversion.

Writes learned/wavelet.npz: W[32] (offset 8), Winv[64] (offset 24).
"""

import numpy as np

import wb
import isf_lab as L
import isf_param as IP
import scan_isf4 as S4

NW = 32
OFF = 8
NWI = 64
OFFI = 24

CONFIGS = [{}, {"f1a": 40}, {"f1a": 201}, {"f1b": 77}, {"f1b": 130},
           {"f2a": 12}, {"f2b": 66}, {"f2c": 33}, {"f2e": 13}]
POSITIONS = (0,)


def main():
    z = np.load("learned/isf_tables.npz")
    rowsA, rowsY = [], []
    for cfg in CONFIGS:
        # decoded isf for this config under pi2 (single application):
        d = sum(z[f"delta_{k}"][v] for k, v in cfg.items()) \
            if cfg else np.zeros(16)
        isf = z["base16"] + d
        a16 = IP.isf_to_a(isf)
        for p in POSITIONS:
            s16s = 320 * S4.WARM + S4.WOFF
            on = wb.decode_bits(S4.frames_for(cfg, p))
            off = wb.decode_bits(S4.frames_for(cfg, None))
            dd = S4.lp62((on - off)[s16s: s16s + S4.WIN])
            h = L.resample_to_128(dd, 250)
            # model synthesis: code diff (+2@pos p, +2@pos 0) at sf3
            code = np.zeros(64 + 192)
            code[4 * p] += 2.0
            code[0] += 2.0
            s = np.zeros(250 + NW)
            for n in range(len(s)):
                v = code[n] if n < len(code) else 0.0
                for k in range(1, 17):
                    if n - k >= 0:
                        v -= a16[k] * s[n - k]
                s[n] = v
            for n in range(20, 250):
                feat = np.zeros(NW)
                for j in range(NW):
                    idx = n - j + OFF
                    if 0 <= idx < len(s):
                        feat[j] = s[idx]
                rowsA.append(feat)
                rowsY.append(h[n])
    A = np.array(rowsA)
    y = np.array(rowsY)
    lam = 1e-4 * np.trace(A.T @ A) / NW
    W = np.linalg.solve(A.T @ A + lam * np.eye(NW), A.T @ y)
    rel = np.linalg.norm(A @ W - y) / np.linalg.norm(y)
    print(f"W fit: rel resid {rel:.4f}")

    # regularized inverse on the unit circle
    NF = 512
    Wf = np.fft.rfft(np.concatenate([W[OFF:], np.zeros(NF - NW), W[:OFF]]))
    mx = np.abs(Wf).max()
    Inv = np.conj(Wf) / (np.abs(Wf) ** 2 + (0.05 * mx) ** 2)
    winv_t = np.fft.irfft(Inv, NF)
    # center: Winv[j] applies to x[n - j + OFFI]
    winv = np.concatenate([winv_t[-OFFI:], winv_t[:NWI - OFFI]])
    # check: W * Winv ~ delta
    conv = np.convolve(W, winv)
    peak = np.argmax(np.abs(conv))
    pur = np.abs(conv[peak]) / np.linalg.norm(conv)
    print(f"W*Winv: peak {conv[peak]:.3f} at {peak} purity {pur:.3f}")
    np.savez("learned/wavelet.npz", W=W, OFF=OFF, Winv=winv, OFFI=OFFI,
             rel=rel)
    print("saved learned/wavelet.npz")


if __name__ == "__main__":
    main()
