"""Full prototype Layer III encoder (mono, long blocks, zero scalefactors,
Shine-style global_gain rate control).  Conventions pinned by probing:
  - analysis window C solved from the PR condition (lag 481, resid 5e-5)
  - MDCT scale 1/9 (TDAC identity with the verified decoder model)
  - encoder-side frequency inversion: odd subband, odd step-in-granule
  - inverse alias butterflies: lo' = lo*cs + hi*ca, hi' = hi*cs - lo*ca
"""
import json

import numpy as np

from packer import BitWriter, BR1, SR1, BR2, SR2

import os
_HERE = os.path.dirname(os.path.abspath(__file__))

D = np.load(_HERE + "/learned/window_D.npy")
C = np.load("/tmp/mp3lab/window_C.npy")
TAB = json.load(open(_HERE + "/learned/tables.json"))
AUX = json.load(open(_HERE + "/learned/aux_tables.json"))

CI = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037])
CS = 1 / np.sqrt(1 + CI ** 2)
CA = CI / np.sqrt(1 + CI ** 2)

# ---- precomputed encode tables ----
HUFF = {}
for tno_s, rec in TAB.items():
    tno = int(tno_s)
    codes = {}
    for xy, bits in rec["codes"].items():
        x, y = map(int, xy.split(","))
        codes[(x, y)] = bits
    HUFF[tno] = {"codes": codes, "linbits": rec["linbits"],
                 "xlen": rec["xlen"], "ylen": rec["ylen"]}
C1A = {tuple(v): k for k, v in AUX["count1A"].items()}
C1B = {}
for n in range(16):
    v = ((n >> 3) & 1, (n >> 2) & 1, (n >> 1) & 1, n & 1)
    C1B[v] = format(~n & 0xF, "04b")

# candidate tables by max value
NON_ESC = [1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15]
ESC = list(range(16, 24)) + list(range(24, 32))


def analysis_filterbank(x):
    n = len(x) // 32
    S = np.zeros((n, 32))
    fifo = np.zeros(512)
    kk = np.arange(32)[:, None]
    jj = np.arange(64)[None, :]
    M = np.cos((2 * kk + 1) * (jj - 16) * np.pi / 64)
    Mfull = M[:, np.arange(512) % 64]
    for t in range(n):
        fifo = np.roll(fifo, 32)
        fifo[:32] = x[t * 32:(t + 1) * 32][::-1]
        S[t] = Mfull @ (fifo * C)
    return S


_i = np.arange(36)[:, None]
_k = np.arange(18)[None, :]
_MDCT_M = np.cos(np.pi / 72 * (2 * _i + 1 + 18) * (2 * _k + 1))
_MDCT_W = np.sin(np.pi / 36 * (np.arange(36) + 0.5))


def granule_spectrum(prev18, cur18):
    """(18,32)+(18,32) subband samples -> 576 spectral lines."""
    xr = np.zeros(576)
    for sb in range(32):
        seg = np.concatenate([prev18[:, sb], cur18[:, sb]])
        if sb % 2 == 1:
            parity = np.arange(36) % 2 == 1
            seg = seg * np.where(parity, -1.0, 1.0)
        xr[sb * 18:(sb + 1) * 18] = (1.0 / 9.0) * (
            _MDCT_M.T @ (seg * _MDCT_W))
    # inverse alias butterflies
    for b in range(1, 32):
        for j in range(8):
            lo, hi = 18 * b - 1 - j, 18 * b + j
            a, c = xr[lo], xr[hi]
            xr[lo] = a * CS[j] + c * CA[j]
            xr[hi] = c * CS[j] - a * CA[j]
    return xr


def quantize(xr, gg):
    step = 2.0 ** ((gg - 210) / 4.0)
    q = np.floor((np.abs(xr) / step) ** 0.75 + 0.4054).astype(np.int64)
    return np.where(xr < 0, -q, q)


def huff_cost_pair(tno, pairs):
    """Bits to code `pairs` with table tno (None if out of range)."""
    h = HUFF[tno]
    lb = h["linbits"]
    maxv = 15 + (2 ** lb - 1) if lb else (h["xlen"] - 1)
    total = 0
    for x, y in pairs:
        ax, ay = abs(x), abs(y)
        if ax > maxv or ay > maxv:
            return None
        cx = min(ax, 15)
        cy = min(ay, 15)
        if (cx >= h["xlen"] or cy >= h["ylen"]):
            return None
        total += len(h["codes"][(cx, cy)])
        if cx == 15 and lb:
            total += lb
        if cy == 15 and lb:
            total += lb
        # a literal 15 in a linbits table must still use the escape path
        if ax > 15 or (ax == 15 and lb == 0 and h["xlen"] == 16):
            pass
        total += (1 if ax else 0) + (1 if ay else 0)
    return total


def best_table(pairs):
    if not pairs or max(max(abs(x), abs(y)) for x, y in pairs) == 0:
        return 0, 0
    best = None
    for tno in NON_ESC + ESC:
        c = huff_cost_pair(tno, pairs)
        if c is not None and (best is None or c < best[1]):
            best = (tno, c)
    if best is None:
        raise ValueError("value exceeds all tables")
    return best


def encode_bigpair(w, tno, x, y):
    h = HUFF[tno]
    lb = h["linbits"]
    ax, ay = abs(x), abs(y)
    cx, cy = min(ax, 15), min(ay, 15)
    w.put_bits(h["codes"][(cx, cy)])
    if cx == 15 and lb:
        w.put(ax - 15, lb)
    if ax:
        w.put(1 if x < 0 else 0, 1)
    if cy == 15 and lb:
        w.put(ay - 15, lb)
    if ay:
        w.put(1 if y < 0 else 0, 1)


def granule_encode(ix, sfb):
    """Quantized 576 values -> (side_fields, bitstring) or None if a value
    overflows all tables."""
    # split: trailing zeros / count1 quads (|v|<=1) / big values
    nz = 576
    while nz > 0 and ix[nz - 1] == 0:
        nz -= 1
    c1_start = nz
    while c1_start > 0 and abs(ix[c1_start - 1]) <= 1:
        c1_start -= 1
    # big values region must be an even number of coefficients
    if c1_start % 2:
        c1_start += 1
    # count1 region covers quads; round nz up to quad boundary from c1_start
    n_quads = (nz - c1_start + 3) // 4
    big_values = c1_start // 2
    if big_values > 288:
        return None
    # region boundaries on sfb lines
    r0, r1 = 7, 7
    b1 = min(sfb[r0 + 1], c1_start)
    b2 = min(sfb[r0 + r1 + 2], c1_start)
    regions = [(0, b1), (b1, b2), (b2, c1_start)]
    sel, cost = [], 0
    for lo, hi in regions:
        pairs = [(ix[i], ix[i + 1]) for i in range(lo, hi, 2)]
        try:
            tno, c = best_table(pairs)
        except ValueError:
            return None
        sel.append(tno)
        cost += c
    # count1: A vs B
    quads = []
    for qi in range(n_quads):
        base = c1_start + 4 * qi
        q = [ix[base + j] if base + j < 576 else 0 for j in range(4)]
        if any(abs(v) > 1 for v in q):
            return None
        quads.append(tuple(q))
    costA = sum(len(C1A[tuple(abs(v) for v in q)]) + sum(abs(v) for v in q)
                for q in quads)
    costB = sum(4 + sum(abs(v) for v in q) for q in quads)
    use_b = costB < costA
    cost += costB if use_b else costA
    # write bits
    w = BitWriter()
    for (lo, hi), tno in zip(regions, sel):
        if tno == 0:
            continue
        for i in range(lo, hi, 2):
            encode_bigpair(w, tno, ix[i], ix[i + 1])
    table = C1B if use_b else C1A
    for q in quads:
        mag = tuple(abs(v) for v in q)
        w.put_bits(table[mag] if not use_b else C1B[mag])
        for v in q:
            if v:
                w.put(1 if v < 0 else 0, 1)
    bits = "".join("1" if b else "0" for b in w.bits)
    assert len(bits) == cost, (len(bits), cost)
    return {"big_values": big_values, "table_select": sel,
            "region0_count": r0, "region1_count": r1,
            "count1table_select": 1 if use_b else 0}, bits


def encode_granule(xr, sfb, budget):
    """Rate loop: smallest quantization step whose coded size fits budget."""
    lo, hi = 0, 255
    best = None
    # binary search the smallest gg (finest step) that fits
    while lo <= hi:
        gg = (lo + hi) // 2
        ix = quantize(xr, gg)
        if np.abs(ix).max() > 15 + 8191:
            lo = gg + 1
            continue
        enc = granule_encode(ix, sfb)
        if enc is not None and len(enc[1]) <= budget:
            best = (gg, enc)
            hi = gg - 1
        else:
            lo = gg + 1
    if best is None:
        raise RuntimeError("even coarsest quantization does not fit")
    gg, (fields, bits) = best
    fields = dict(fields)
    fields["global_gain"] = gg
    fields["part2_3_length"] = len(bits)
    fields["maindata"] = bits
    return fields


def encode(x, sample_rate=16000, kbps=32):
    """Encode mono float audio -> mp3 bytes (no reservoir: each frame
    self-contained, main_data_begin=0, stuffing zeros)."""
    from packer import mpeg1_frame, mpeg2_frame
    mpeg = 1 if sample_rate in SR1 else 2
    sfb = AUX[f"sfb_{mpeg}_{sample_rate}"]
    granule_samples = 576
    frame_granules = 2 if mpeg == 1 else 1
    frame_samples = granule_samples * frame_granules
    pad = (-len(x)) % frame_samples
    x = np.concatenate([x, np.zeros(pad)])
    S = analysis_filterbank(x)          # (T, 32)
    n_gran = S.shape[0] // 18
    header_side = 32 + (136 if mpeg == 1 else 72)
    frame_bits = (144 if mpeg == 1 else 72) * kbps * 1000 // sample_rate * 8
    budget = (frame_bits - header_side) // frame_granules
    prev = np.zeros((18, 32))
    grans = []
    for g in range(n_gran):
        cur = S[g * 18:(g + 1) * 18]
        xr = granule_spectrum(prev, cur)
        grans.append(encode_granule(xr, sfb, budget))
        prev = cur
    out = b""
    if mpeg == 1:
        for i in range(0, len(grans) - 1, 2):
            out += mpeg1_frame(sample_rate, kbps, [grans[i], grans[i + 1]])
    else:
        for g in grans:
            out += mpeg2_frame(sample_rate, kbps, g)
    return out


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from oracle import mpg123_decode

    sr = 16000
    g = np.random.default_rng(0)
    t = np.arange(sr * 2) / sr
    x = (0.4 * np.sin(2 * np.pi * 440 * t) +
         0.2 * np.sin(2 * np.pi * 1320 * t + 0.3) +
         0.05 * g.standard_normal(len(t)))
    for kbps in (8, 16, 32, 64):
        mp3 = encode(x, sr, kbps)
        pcm, rate, ch, errs = mpg123_decode(mp3)
        # align and SNR
        best = None
        for lag in range(0, 2500):
            if lag + sr > len(pcm):
                break
            r = np.dot(pcm[lag:lag + sr], x[:sr])
            if best is None or r > best[1]:
                best = (lag, r)
        lag = best[0]
        y = pcm[lag:lag + len(x)]
        n = min(len(y), len(x))
        err = y[:n] - x[:n]
        snr = 10 * np.log10(np.dot(x[:n], x[:n]) / (np.dot(err, err) + 1e-12))
        print(f"{kbps} kbps: {len(mp3)} bytes, rate {rate}, errs "
              f"{len(errs)}, lag {lag}, SNR {snr:.1f} dB")
