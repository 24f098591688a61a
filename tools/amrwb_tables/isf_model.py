"""Forward model for the AMR-WB ISF layer: exact binary tables ->
ISF (Hz) -> ISP (cosine domain) -> A16 polynomial -> LP pole angles,
the domain isf_lab measures in.

Tables extracted from the in-image libavcodec at the declaration-order
offsets after the [128][2] gain table / isf_init ladder (pinned by the
behavioral column-footprint match + the assignment runs below); the
conversion math is the published TS 26.190 ISP decomposition:
  F1 = (1+q16) * prod_{even i}(1 - 2 cos w_i z^-1 + z^-2)
  F2 = (1-q16) * (1 - z^-2) * prod_{odd i}(...)
  A  = (F1 + F2) / 2,  w_i = pi*isf_i/6400,  q16 = cos(pi*isf_15/3200)
Unit: 1 table unit = 6400/16384 Hz (isf_init = uniform 400 Hz ladder).
"""

from __future__ import annotations

import numpy as np

LIB = "/usr/lib/x86_64-linux-gnu/libavcodec.so.59.37.100"
BASE = 11373216  # first byte of dico1_isf (after isf_init @11373184)
UNIT = 6400.0 / 16384.0  # Hz per table unit

LAYOUT = [
    ("dico1", 256, 9), ("dico2", 256, 7),
    ("dico21", 64, 3), ("dico22", 128, 3), ("dico23", 128, 3),
    ("dico24", 32, 3), ("dico25", 32, 4),
    ("dico21_36b", 128, 5), ("dico22_36b", 128, 4), ("dico23_36b", 64, 7),
]

# field -> (table, target coords in the 16-dim ISF vector)
FIELD_TABLE = {
    "f1a": ("dico1", list(range(0, 9))),
    "f1b": ("dico2", list(range(9, 16))),
    "f2a": ("dico21", [0, 1, 2]),
    "f2b": ("dico22", [3, 4, 5]),
    "f2c": ("dico23", [6, 7, 8]),
    "f2d": ("dico24", [9, 10, 11]),
    "f2e": ("dico25", [12, 13, 14, 15]),
}


def load_tables():
    data = open(LIB, "rb").read()
    out = {}
    o = BASE
    for name, R, D in LAYOUT:
        out[name] = np.frombuffer(data[o:o + 2 * R * D], np.int16) \
            .reshape(R, D).astype(np.float64)
        o += 2 * R * D
    return out


def residual_hz(tables, idx):
    """Stage1+stage2 residual vector (16,) in Hz for field index dict."""
    r = np.zeros(16)
    for f, (tn, coords) in FIELD_TABLE.items():
        r[coords] += tables[tn][idx.get(f, 0)] * UNIT
    return r


def poly_from_cos(ws):
    """prod_i (1 - 2 cos(w_i) z^-1 + z^-2) coefficient vector."""
    p = np.array([1.0])
    for w in ws:
        p = np.convolve(p, [1.0, -2.0 * np.cos(w), 1.0])
    return p


def a16_from_isf(isf_hz):
    """TS 26.190 Isp_Az: ISF (Hz, 16) -> A(z) coefficients (17,)."""
    w = np.pi * np.asarray(isf_hz[:15], float) / 6400.0
    q16 = np.cos(np.pi * float(isf_hz[15]) / 3200.0)
    f1 = poly_from_cos(w[0::2])            # 8 even freqs, degree 16
    f2 = poly_from_cos(w[1::2])            # 7 odd freqs, degree 14
    f2 = np.convolve(f2, [1.0, 0.0, -1.0])  # * (1 - z^-2)
    return 0.5 * ((1.0 + q16) * f1 + (1.0 - q16) * f2)


def pole_angles_hz(a):
    """Sorted |angles| of the roots of A(z), in Hz at 12.8 kHz."""
    r = np.roots(np.asarray(a, float))
    ang = np.abs(np.angle(r))
    return np.sort(ang) * 12800.0 / (2.0 * np.pi)


def model_freqs(isf_hz):
    """Measured-domain prediction: 16 sorted pole angles, paired down
    to the isf_lab convention (each conjugate pair appears twice; take
    every other entry like isf_lab's freq[::2] then all 16)."""
    f = pole_angles_hz(a16_from_isf(isf_hz))
    # roots come in conjugate pairs -> 32 angles for order 16? no:
    # order 16 poly has 16 roots; complex pairs give duplicated |angle|.
    return f


def invert_to_isf(target16, x0=None, iters=60):
    """Newton-ish inversion: find isf (Hz,16) whose pole angles match
    target16 (sorted, 16 entries from a 16-root polynomial)."""
    x = np.array(x0 if x0 is not None else np.linspace(400, 6000, 16))
    x[15] = 1500.0
    for _ in range(iters):
        f = model_freqs(x)
        rvec = f - target16
        J = np.zeros((16, 16))
        for j in range(16):
            d = np.zeros(16)
            d[j] = 1.0
            J[:, j] = (model_freqs(x + d) - f) / 1.0
        dx, *_ = np.linalg.lstsq(J, -rvec, rcond=None)
        step = np.clip(dx, -120, 120)
        x = x + 0.8 * step
        if np.max(np.abs(rvec)) < 1e-6:
            break
    return x


if __name__ == "__main__":
    t = load_tables()
    for n, R, D in LAYOUT:
        print(n, t[n].shape, "row0:", t[n][0].astype(int).tolist())
