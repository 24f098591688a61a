"""Measure the adaptive-codebook interpolation kernel of lavc's amrwb
decoder, per lag fraction and LTP-filter flag.

Probe: frame3 carries a loud +2 code pulse at sf3 position 0 (12.8 kHz
global sample 192); frame4's sf0 reads the excitation back at
T = 70 + frac/4 (abs lag idx 144+frac), so its output is
gp * K_frac (x) chain(pulse).  The same decode with lag idx 400
(T = 125.5, pointing at silent history) is the base — subtracting it
cancels frame4's own -2@0 code ring and the gain-scaled high band.
The ratio FFT(echo)/FFT(direct) then reads gp * K_frac(w) directly,
where `direct` is frame3's own pulse response.

Writes learned/interp_kernel.npz: K[flag][frac] as 12.8k-domain FIR
taps (time window around the nominal delay), plus the diagnostics.
"""

import os

import numpy as np

import wb
import isf_lab as L

HERE = os.path.dirname(os.path.abspath(__file__))
LAG_SF0 = [10, 11, 12, 13, 14, 46, 69, 79, 91]
LAG_SF2 = [15, 16, 17, 18, 19, 51, 70, 80, 92]
SF3_CODE_BIT = 121
GAIN_SF3 = [b + 3 for b in L.GAIN0]
HIGH_GP_ROW = 127
T_INT = 70           # frame4 sf0 delay integer: reads global 192 region


def f3():
    bits = [0] * wb.BITS
    for i, b in enumerate(LAG_SF2):
        if (300 >> (8 - i)) & 1:
            bits[b] = 1
    for i, b in enumerate(GAIN_SF3):
        if (L.GAIN_LOUD >> (6 - i)) & 1:
            bits[b] = 1
    bits[SF3_CODE_BIT] = 1
    return bits


def f4(lag_idx, flag):
    bits = [0] * wb.BITS
    for i, b in enumerate(LAG_SF0):
        if (lag_idx >> (8 - i)) & 1:
            bits[b] = 1
    for i, b in enumerate(L.GAIN0):
        if (HIGH_GP_ROW >> (6 - i)) & 1:
            bits[b] = 1
    bits[105] = flag
    return bits


def lp62(x):
    N = 4096
    X = np.fft.rfft(x, N)
    X[int(6200 / 16000 * N):] = 0
    return np.fft.irfft(X, N)[:len(x)]


def decode(lag_idx, flag):
    frames = [[0] * wb.BITS] * 2 + [f3(), f4(lag_idx, flag)]
    return wb.decode_bits(frames)


def main():
    base = decode(enc_idx(140), 0)  # reads silent history
    direct = lp62(base[2 * 320 + 240: 2 * 320 + 320 + 80])  # sf3 + spill
    out = {}
    for flag in (0, 1):
        for frac in range(4):
            idx = (T_INT - 34) * 4 + frac
            r = decode(idx, flag)
            echo = lp62((r - base)[3 * 320: 3 * 320 + 160])
            # deconvolve: K(w) = FFT(echo) / FFT(direct) with the known
            # integer offsets; regularized
            N = 2048
            E = np.fft.rfft(echo, N)
            D = np.fft.rfft(direct, N)
            mx = np.abs(D).max()
            K = E * np.conj(D) / (np.abs(D) ** 2 + (0.03 * mx) ** 2)
            k = np.fft.irfft(K, N)
            # energy should sit around the delay alignment; grab a
            # 24-sample window at 16k (the kernel lives at 12.8k but we
            # bank the 16k-domain response; the codec port resamples)
            w = np.concatenate([k[-12:], k[:28]])
            out[f"k_{flag}_{frac}"] = w
            pk = int(np.argmax(np.abs(w))) - 12
            print(f"flag {flag} frac {frac}: peak at {pk} amp "
                  f"{w[pk + 12]:.3f} energy {np.linalg.norm(w):.3f}",
                  flush=True)
    np.savez(os.path.join(HERE, "learned", "interp_kernel.npz"), **out,
             direct=direct)
    print("saved")


def enc_idx(T):  # abs lag idx for integer T (frac 0)
    return (T - 34) * 4


if __name__ == "__main__":
    main()
