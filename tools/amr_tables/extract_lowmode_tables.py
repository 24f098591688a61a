"""Extract the non-MR122 AMR-NB tables from the system libavcodec image
at the offsets pinned behaviorally in FACTS.md (slide-matched from
mode-7k95/mode-1 probes; the tiling of the LSF block plus table sizes
force the rest), and save them to learned/lowmode_tables.npz.

The offsets came from behavioral scans (scan_lsf*.py, pin_lsf3_tables.py,
modes_lab.binary_tables) — every table here is re-verified at use time by
oracle probes in amrnb_low.py / probe_low_*.py before anything ships.

Canonical (supersedes the inline binary_tables() in modes_lab.py, which
is kept for compatibility).
"""

from __future__ import annotations

import os

import numpy as np

LIB = "/usr/lib/x86_64-linux-gnu/libavcodec.so.59.37.100"
HERE = os.path.dirname(os.path.abspath(__file__))

# Behaviorally pinned constants (FACTS.md "Low-mode" section): mean LSF
# vector (frame-1 group medians match to 0.4 table units) and the MA
# predictor factors. The predictor factors were RE-FIT per coefficient
# from true-LSF extractions (fit_pred_fac.py; max resid 0.05 table
# units over 147 multi-stream samples — the earlier median-over-rows
# fit was contaminated by reorder push-up on coefs 1,2,4,5,6,9), then
# the fitted Q15 vector was located as float32 in the library image at
# byte 11370488, pinning it exactly.
MEAN_LSF_3 = np.array([1546, 2272, 3778, 5488, 6972, 8382, 10047, 11229,
                       12766, 13714], np.float64)  # table units (/4.096=Hz)
PRED_FAC_OFF = 11370488  # float32 [10] in the library image


def main():
    data = open(LIB, "rb").read()

    def i16(off, n):
        return np.frombuffer(data[off:off + 2 * n], np.int16).copy()

    def f32(off, n):
        return np.frombuffer(data[off:off + 4 * n], np.float32).copy()

    t = dict(
        # --- 3-split LSF residual tables (tiled block, FACTS.md) ---
        lsf_3_3=i16(11355168, 512 * 4).reshape(512, 4),
        lsf_3_2=i16(11359264, 512 * 3).reshape(512, 3),
        lsf_3_1=i16(11362336, 256 * 3).reshape(256, 3),
        lsf_3_1_795=i16(11363872, 512 * 3).reshape(512, 3),
        lsf_3_3_515=i16(11366944, 128 * 4).reshape(128, 4),
        mean_lsf_3=MEAN_LSF_3,
        pred_fac=f32(PRED_FAC_OFF, 10).astype(np.float64),
        # --- joint gain VQ tables (modes_lab.binary_tables offsets) ---
        gains_MR475=i16(11345248, 256 * 4).reshape(256, 4),
        gains_high=i16(11344736, 128 * 2).reshape(128, 2),
        gains_low=i16(11344480, 64 * 2).reshape(64, 2),
        # --- phase-dispersion impulse responses (3 x 40 float32) ---
        ir_filters=np.stack([f32(11344000 + 160 * k, 40).astype(np.float64)
                             for k in range(3)]),
        # --- fixed-gain predictor energy means (float32) ---
        energy_mean=f32(11347328, 8).astype(np.float64),
        # --- MR122/MR795 scalar gain tables (amrnb_dec.py values) ---
        qua_gain_pitch_q14=i16(11347424, 16),
    )

    # Tiling sanity: the five LSF tables + mean_lsf_5 must abut exactly.
    assert 11355168 + 512 * 4 * 2 == 11359264
    assert 11359264 + 512 * 3 * 2 == 11362336
    assert 11362336 + 256 * 3 * 2 == 11363872
    assert 11363872 + 512 * 3 * 2 == 11366944
    assert 11366944 + 128 * 4 * 2 == 11367968
    mean5 = i16(11367968, 10)
    assert mean5.tolist() == [1384, 2077, 3420, 5108, 6742, 8122, 9863,
                              11092, 12714, 13701], mean5

    out = os.path.join(HERE, "learned", "lowmode_tables.npz")
    np.savez(out, **t)
    for k, v in t.items():
        print(f"{k:16s} {v.shape} dtype={v.dtype} "
              f"range [{np.min(v):.4g}, {np.max(v):.4g}]")
    print("saved", out)


if __name__ == "__main__":
    main()
