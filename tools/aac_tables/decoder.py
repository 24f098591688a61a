"""Pure-Python AAC-LC decoder (mono, raw raw_data_block packets or ADTS)
built ONLY on the tables recovered in learned/aac_tables.json.

Purpose: behavioral validation of the recovered ISO 13818-7 tables — if any
Huffman codebook, swb offset, or window is wrong, the bit parse desyncs (or
the PCM diverges) against libavcodec's decode of the same packets
(tests/test_aac_conformance.py). Also the executable spec for the C++
codec in native/augment/aac.cc.

Reference behavior target: /root/reference/channel_simulation/
simulated_compression.py:11-13 (aac[8k]/aac[16k]/aac[32k]).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

_T = json.loads((Path(__file__).parent / "learned" /
                 "aac_tables.json").read_text())

SF_OFFSET = 100
ZERO_HCB, NOISE_HCB, INTENSITY_HCB2, INTENSITY_HCB = 0, 13, 14, 15
ONLY_LONG, LONG_START, EIGHT_SHORT, LONG_STOP = 0, 1, 2, 3

# per-book (dimension, signed-in-codeword, LAV = largest absolute value)
BOOK_META = {1: (4, True, 1), 2: (4, True, 1), 3: (4, False, 2),
             4: (4, False, 2), 5: (2, True, 4), 6: (2, True, 4),
             7: (2, False, 7), 8: (2, False, 7), 9: (2, False, 12),
             10: (2, False, 12), 11: (2, False, 16)}


def _vlc(bits, codes):
    """(code << 8 | len) -> index lookup dict keyed on (len, code)."""
    return {(b, c): i for i, (b, c) in enumerate(zip(bits, codes))}


_SPEC_VLC = {int(k): _vlc(v["bits"], v["codes"])
             for k, v in _T["spectral"].items()}
_SF_VLC = _vlc(_T["scalefactor"]["bits"], _T["scalefactor"]["codes"])
_MAXLEN = {k: max(_T["spectral"][str(k)]["bits"]) for k in _SPEC_VLC}
_SF_MAXLEN = max(_T["scalefactor"]["bits"])


class Bits:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0  # bit position

    def get(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.d[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def bits_left(self) -> int:
        return len(self.d) * 8 - self.pos


def _hdec(bs: Bits, vlc, maxlen) -> int:
    code, length = 0, 0
    while length <= maxlen:
        code = (code << 1) | bs.get(1)
        length += 1
        idx = vlc.get((length, code))
        if idx is not None:
            return idx
    raise ValueError("huffman desync")


def sine_window(N):
    n = np.arange(N)
    return np.sin(np.pi / N * (n + 0.5))


def kbd_window(N, alpha):
    kern = np.i0(np.pi * alpha * np.sqrt(
        1.0 - (2.0 * np.arange(N // 2 + 1) / (N // 2) - 1.0) ** 2))
    cum = np.cumsum(kern)
    half = np.sqrt(cum[:-1] / cum[-1])
    return np.concatenate([half, half[::-1]])


WIN = {("sine", 2048): sine_window(2048), ("sine", 256): sine_window(256),
       ("kbd", 2048): kbd_window(2048, 4.0), ("kbd", 256): kbd_window(256, 6.0)}


def imdct(X):
    """ISO 13818-7 IMDCT: N output samples from N/2 coefficients."""
    N2 = len(X)
    N = 2 * N2
    n0 = (N2 + 1) / 2.0
    n = np.arange(N)
    k = np.arange(N2)
    return (2.0 / N) * np.cos(
        2.0 * np.pi / N * np.outer(n + n0, k + 0.5)) @ X


_IMDCT_CACHE = {}


def imdct_cached(X):
    N2 = len(X)
    if N2 not in _IMDCT_CACHE:
        N = 2 * N2
        n0 = (N2 + 1) / 2.0
        n = np.arange(N)
        k = np.arange(N2)
        _IMDCT_CACHE[N2] = (2.0 / N) * np.cos(
            2.0 * np.pi / N * np.outer(n + n0, k + 0.5))
    return _IMDCT_CACHE[N2] @ X


def _parse_ics(bs: Bits, fs_key: str):
    """individual_channel_stream for AAC-LC SCE -> dequantized 1024-coef
    spectrum (per window for EIGHT_SHORT) + window info."""
    global_gain = bs.get(8)
    assert bs.get(1) == 0, "ics_reserved"
    window_sequence = bs.get(2)
    window_shape = bs.get(1)
    short = window_sequence == EIGHT_SHORT
    if short:
        max_sfb = bs.get(4)
        grouping = bs.get(7)
        # group lengths from the 7 grouping bits (1 = same group as prev)
        group_len = [1]
        for i in range(7):
            if (grouping >> (6 - i)) & 1:
                group_len[-1] += 1
            else:
                group_len.append(1)
        swb = _T["swb"][f"short_{fs_key}"]
    else:
        max_sfb = bs.get(6)
        assert bs.get(1) == 0, "predictor_data_present in LC"
        group_len = [1]
        swb = _T["swb"][f"long_{fs_key}"]
    n_groups = len(group_len)
    assert max_sfb <= len(swb) - 1, (max_sfb, len(swb) - 1)

    # section_data
    sect_bits = 3 if short else 5
    esc = (1 << sect_bits) - 1
    sections = []  # (group, cb, sfb_start, sfb_end)
    band_cb = np.zeros((n_groups, max_sfb), np.int32)
    for g in range(n_groups):
        k = 0
        while k < max_sfb:
            cb = bs.get(4)
            length = 0
            while True:
                inc = bs.get(sect_bits)
                length += inc
                if inc != esc:
                    break
            sections.append((g, cb, k, k + length))
            band_cb[g, k:k + length] = cb
            k += length
        assert k == max_sfb

    # scale_factor_data
    sf = np.zeros((n_groups, max_sfb), np.int32)
    last_sf = global_gain
    last_nrg = global_gain - 90
    noise_flag = True
    for g in range(n_groups):
        for b in range(max_sfb):
            cb = band_cb[g, b]
            if cb == ZERO_HCB:
                continue
            if cb in (INTENSITY_HCB, INTENSITY_HCB2):
                _hdec(bs, _SF_VLC, _SF_MAXLEN)  # dpcm position, unused mono
            elif cb == NOISE_HCB:
                if noise_flag:
                    last_nrg += bs.get(9) - 256
                    noise_flag = False
                else:
                    last_nrg += _hdec(bs, _SF_VLC, _SF_MAXLEN) - 60
                sf[g, b] = last_nrg
            else:
                last_sf += _hdec(bs, _SF_VLC, _SF_MAXLEN) - 60
                sf[g, b] = last_sf

    # pulse_data
    pulses = []
    if bs.get(1):
        assert not short, "pulse with short windows"
        n_pulse = bs.get(2) + 1
        start_sfb = bs.get(6)
        base = swb[start_sfb]
        for _ in range(n_pulse):
            base += bs.get(5)
            pulses.append((base, bs.get(4)))

    # tns_data
    tns = None
    if bs.get(1):
        tns = _parse_tns(bs, short)
    assert bs.get(1) == 0, "gain_control (SSR) in LC"

    # spectral_data -> quantized coefficients, grouped layout:
    # for group g, for sfb b, for window w in group, width coefficients
    width_total = 128 if short else 1024
    offs = 0
    grp_base = []
    for wlen in group_len:
        grp_base.append(offs)
        offs += wlen * width_total
    assert offs == 1024

    spec_grouped = np.zeros(1024, np.int64)
    for g, cb, b0, b1 in sections:
        wlen = group_len[g]
        for b in range(b0, b1):
            width = (swb[b + 1] - swb[b]) * wlen
            start = grp_base[g] + swb[b] * wlen
            if cb in (ZERO_HCB, NOISE_HCB, INTENSITY_HCB, INTENSITY_HCB2):
                continue
            dim, signed, lav = BOOK_META[cb]
            vlc, ml = _SPEC_VLC[cb], _MAXLEN[cb]
            vals = np.zeros(width, np.int64)
            for i in range(0, width, dim):
                idx = _hdec(bs, vlc, ml)
                if signed:
                    q = []
                    rem = idx
                    for _ in range(dim):
                        q.append(rem % (2 * lav + 1))
                        rem //= (2 * lav + 1)
                    q = [v - lav for v in reversed(q)]
                else:
                    q = []
                    rem = idx
                    for _ in range(dim):
                        q.append(rem % (lav + 1))
                        rem //= (lav + 1)
                    q = list(reversed(q))
                    q = [(-v if (v and bs.get(1)) else v) for v in q]
                if cb == 11:
                    q = [_esc_decode(bs, v) for v in q]
                vals[i:i + dim] = q
            spec_grouped[start:start + width] = vals

    for base, amp in pulses:
        # pulse positions index the non-grouped long spectrum (long only)
        if spec_grouped[base] > 0:
            spec_grouped[base] += amp
        else:
            spec_grouped[base] -= amp

    return dict(global_gain=global_gain, window_sequence=window_sequence,
                window_shape=window_shape, max_sfb=max_sfb,
                group_len=group_len, swb=swb, band_cb=band_cb, sf=sf,
                spec_grouped=spec_grouped, tns=tns, grp_base=grp_base)


def _esc_decode(bs: Bits, v):
    if abs(v) != 16:
        return v
    n = 4
    while bs.get(1):
        n += 1
    word = bs.get(n)
    mag = (1 << n) + word
    return -mag if v < 0 else mag


def _parse_tns(bs: Bits, short):
    n_windows = 8 if short else 1
    filt = []
    for w in range(n_windows):
        n_filt = bs.get(1 if short else 2)
        coef_res = bs.get(1) if n_filt else 0
        fl = []
        for _ in range(n_filt):
            length = bs.get(4 if short else 6)
            order = bs.get(3 if short else 5)
            direction = compress = 0
            coefs = []
            if order:
                direction = bs.get(1)
                compress = bs.get(1)
                nb = coef_res + 3 - compress
                coefs = [bs.get(nb) for _ in range(order)]
            fl.append(dict(length=length, order=order, direction=direction,
                           compress=compress, coef_res=coef_res,
                           coefs=coefs))
        filt.append(fl)
    return filt


def _tns_lpc(f):
    """Transmitted coef indices -> LPC coefficients (ISO 13818-7 tns)."""
    res = f["coef_res"] + 3
    nb = res - f["compress"]
    iqfac = ((1 << (res - 1)) - 0.5) / (np.pi / 2.0)
    iqfac_m = ((1 << (res - 1)) + 0.5) / (np.pi / 2.0)
    dec = []
    for c in f["coefs"]:
        if c & (1 << (nb - 1)):  # sign-extend
            c -= (1 << nb)
        dec.append(np.sin(c / (iqfac if c >= 0 else iqfac_m)))
    # Levinson-style conversion reflection -> direct form
    a = np.zeros(f["order"] + 1)
    a[0] = 1.0
    for m, k in enumerate(dec, start=1):
        prev = a.copy()
        for i in range(1, m):
            a[i] = prev[i] + k * prev[m - i]
        a[m] = k
    return a  # a[0]=1, filter 1/A(z) applied by decoder


def _apply_tns(spec, info, fs_key):
    tns = info["tns"]
    if tns is None:
        return spec
    short = info["window_sequence"] == EIGHT_SHORT
    swb = info["swb"]
    tns_max_bands = _tns_max_bands(fs_key, short)
    n_windows = 8 if short else 1
    for w in range(min(n_windows, len(tns))):
        bottom = len(swb) - 1
        for f in tns[w]:
            top = bottom
            bottom = max(top - f["length"], 0)
            order = f["order"]
            if order == 0:
                continue
            a = _tns_lpc(f)
            m0 = min(bottom, tns_max_bands, info["max_sfb"])
            m1 = min(top, tns_max_bands, info["max_sfb"])
            start, end = swb[m0], swb[m1]
            if end <= start:
                continue
            seg = spec[w, start:end].copy()
            if f["direction"]:
                seg = seg[::-1]
            # synthesis: all-pole 1/A(z)
            out = np.zeros_like(seg)
            for n in range(len(seg)):
                acc = seg[n]
                for i in range(1, min(order, n) + 1):
                    acc -= a[i] * out[n - i]
                out[n] = acc
            if f["direction"]:
                out = out[::-1]
            spec[w, start:end] = out
    return spec


def _tns_max_bands(fs_key, short):
    # ISO 13818-7 Table 8.9, 16 kHz family: long 42, short 14
    if fs_key == "16":
        return 14 if short else 42
    return 14 if short else 42


def _dequant(info):
    """Grouped int spectrum -> per-window float spectra (n_windows, width)."""
    short = info["window_sequence"] == EIGHT_SHORT
    width = 128 if short else 1024
    n_windows = 8 if short else 1
    swb, sf = info["swb"], info["sf"]
    xg = info["spec_grouped"].astype(np.float64)
    xg = np.sign(xg) * np.abs(xg) ** (4.0 / 3.0)
    spec = np.zeros((n_windows, width))
    w0 = 0
    for g, wlen in enumerate(info["group_len"]):
        base = info["grp_base"][g]
        for b in range(info["max_sfb"]):
            if info["band_cb"][g, b] in (NOISE_HCB, INTENSITY_HCB,
                                         INTENSITY_HCB2):
                continue  # PNS/IS synthesis not modelled (encoder-off)
            gain = 2.0 ** (0.25 * (sf[g, b] - SF_OFFSET)) \
                if info["band_cb"][g, b] != ZERO_HCB else 0.0
            bw = swb[b + 1] - swb[b]
            seg = xg[base + swb[b] * wlen: base + swb[b] * wlen + bw * wlen]
            for wi in range(wlen):
                spec[w0 + wi, swb[b]:swb[b + 1]] = \
                    seg[wi * bw:(wi + 1) * bw] * gain
        w0 += wlen
    return spec


class Decoder:
    """Stateful mono AAC-LC decoder over raw raw_data_block packets."""

    def __init__(self, sample_rate=16000):
        self.fs_key = {16000: "16", 8000: "8"}[sample_rate]
        self.overlap = np.zeros(1024)
        self.prev_shape = 0
        self.shapes = {0: "sine", 1: "kbd"}

    def decode_packet(self, pkt: bytes) -> np.ndarray:
        bs = Bits(pkt)
        if len(pkt) >= 2 and pkt[0] == 0xFF and (pkt[1] & 0xF6) == 0xF0:
            self._skip_adts(bs)
        out = None
        while True:
            ele = bs.get(3)
            if ele == 7:  # END
                break
            if ele == 0:  # SCE
                bs.get(4)  # element_instance_tag
                info = _parse_ics(bs, self.fs_key)
                out = self._synth(info)
            elif ele == 6:  # FIL
                cnt = bs.get(4)
                if cnt == 15:
                    cnt += bs.get(8) - 1
                for _ in range(cnt):
                    bs.get(8)
            elif ele == 4:  # DSE
                bs.get(4)
                align = bs.get(1)
                cnt = bs.get(8)
                if cnt == 255:
                    cnt += bs.get(8)
                if align:
                    bs.pos = (bs.pos + 7) & ~7
                for _ in range(cnt):
                    bs.get(8)
            else:
                raise ValueError(f"unsupported element {ele}")
        assert out is not None, "no SCE in packet"
        return out

    def _skip_adts(self, bs: Bits):
        bs.get(12)  # sync
        bs.get(1)   # ID
        bs.get(2)   # layer
        prot_absent = bs.get(1)
        bs.get(2)   # profile
        bs.get(4)   # sfi
        bs.get(1)   # private
        bs.get(3)   # channel cfg
        bs.get(4)   # orig/home/cpy-id/cpy-start
        bs.get(13)  # frame length
        bs.get(11)  # buffer fullness
        bs.get(2)   # raw blocks - 1
        if not prot_absent:
            bs.get(16)

    def _synth(self, info) -> np.ndarray:
        spec = _dequant(info)
        spec = _apply_tns(spec, info, self.fs_key)
        shape = self.shapes[info["window_shape"]]
        prev = self.shapes[self.prev_shape]
        seq = info["window_sequence"]
        frame = np.zeros(2048)
        if seq == EIGHT_SHORT:
            win_cur = WIN[(shape, 256)]
            win_prev = WIN[(prev, 256)]
            for w in range(8):
                t = imdct_cached(spec[w])
                wl = win_prev if w == 0 else win_cur
                t = t * np.concatenate([wl[:128], win_cur[128:]])
                frame[448 + w * 128: 448 + w * 128 + 256] += t
        else:
            t = imdct_cached(spec[0])
            left = np.ones(1024)
            right = np.ones(1024)
            if seq in (ONLY_LONG, LONG_START):
                left = WIN[(prev, 2048)][:1024]
            else:  # LONG_STOP
                ws = WIN[(prev, 256)]
                left[:448] = 0.0
                left[448:576] = ws[:128]
            if seq in (ONLY_LONG, LONG_STOP):
                right = WIN[(shape, 2048)][1024:]
            else:  # LONG_START
                ws = WIN[(shape, 256)]
                right[448:576] = ws[128:]
                right[576:] = 0.0
            frame = t * np.concatenate([left, right])
        out = frame[:1024] + self.overlap
        self.overlap = frame[1024:]
        self.prev_shape = info["window_shape"]
        return out


def decode_packets(packets, sample_rate=16000) -> np.ndarray:
    dec = Decoder(sample_rate)
    return np.concatenate([dec.decode_packet(p) for p in packets])
