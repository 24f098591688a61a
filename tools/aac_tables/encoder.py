"""Pure-Python AAC-LC encoder prototype (mono, 16 kHz, long windows) —
the executable spec for native/augment/aac.cc.

Shine-style integer-friendly design: sine-window MDCT, two-loop
rate/distortion scalefactor search against a psychoacoustic-lite noise
target, per-band Huffman book choice with greedy section merge, ADTS
framing with a small bit reservoir. Output decodes with libavcodec and
with tools/aac_tables/decoder.py.

Reference behavior: /root/reference/channel_simulation/
simulated_compression.py:11-13 (aac at 8/16/32 kbps).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

_T = json.loads((Path(__file__).parent / "learned" /
                 "aac_tables.json").read_text())

SF_OFFSET = 100
MAX_Q = 8191
BOOK_META = {1: (4, True, 1), 2: (4, True, 1), 3: (4, False, 2),
             4: (4, False, 2), 5: (2, True, 4), 6: (2, True, 4),
             7: (2, False, 7), 8: (2, False, 7), 9: (2, False, 12),
             10: (2, False, 12), 11: (2, False, 16)}
SPEC_BITS = {k: np.array(_T["spectral"][str(k)]["bits"], np.int32)
             for k in BOOK_META}
SPEC_CODES = {k: np.array(_T["spectral"][str(k)]["codes"], np.int64)
              for k in BOOK_META}
SF_BITS = np.array(_T["scalefactor"]["bits"], np.int32)
SF_CODES = np.array(_T["scalefactor"]["codes"], np.int64)


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, bits: int):
        assert 0 <= value < (1 << bits), (value, bits)
        self.acc = (self.acc << bits) | value
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self):
        if self.n:
            self.put(0, 8 - self.n)

    def bit_length(self):
        return len(self.buf) * 8 + self.n

    def bytes(self):
        assert self.n == 0
        return bytes(self.buf)


def sine_window(N):
    n = np.arange(N)
    return np.sin(np.pi / N * (n + 0.5))


_WIN = sine_window(2048)
_MDCT = None


def mdct(frame2048):
    """Forward MDCT, ISO convention matching decoder.imdct."""
    global _MDCT
    if _MDCT is None:
        N, N2 = 2048, 1024
        n0 = (N2 + 1) / 2.0
        n = np.arange(N)
        k = np.arange(N2)
        _MDCT = 2.0 * np.cos(2.0 * np.pi / N * np.outer(k + 0.5, n + n0))
    return _MDCT @ frame2048


def quantize(x, sf):
    """AAC nonlinear quantizer: q = floor(|x|^(3/4) * 2^(-3/16 sf') + 0.4054)."""
    mag = (np.abs(x) * 2.0 ** (-0.25 * (sf - SF_OFFSET))) ** 0.75
    return (np.sign(x) * np.floor(mag + 0.4054)).astype(np.int64)


def dequantize(q, sf):
    return np.sign(q) * np.abs(q).astype(np.float64) ** (4.0 / 3.0) * \
        2.0 ** (0.25 * (sf - SF_OFFSET))


def _esc_bits(v):
    """Extra bits for a book-11 escape value (|v| >= 16)."""
    v = abs(v)
    if v < 16:
        return 0
    n = int(v).bit_length() - 1
    return (n - 4 + 1) + n  # prefix ones+zero, then n-bit word


def band_bits(q, book):
    """Huffman bit cost of quantized band q under the given book."""
    dim, signed, lav = BOOK_META[book]
    bits = SPEC_BITS[book]
    total = 0
    for i in range(0, len(q), dim):
        seg = q[i:i + dim]
        if signed:
            idx = 0
            for v in seg:
                idx = idx * (2 * lav + 1) + (int(v) + lav)
        else:
            idx = 0
            for v in seg:
                c = min(abs(int(v)), lav)
                idx = idx * (lav + 1) + c
            total += int(np.count_nonzero(seg))  # sign bits
            if book == 11:
                for v in seg:
                    total += _esc_bits(int(v))
        total += int(bits[idx])
    return total


def best_book(q):
    """Cheapest feasible book for a quantized band (None -> ZERO)."""
    if not np.any(q):
        return 0, 0
    amax = int(np.abs(q).max())
    best = None
    for book, (dim, signed, lav) in BOOK_META.items():
        if amax > lav and book != 11:
            continue
        if book == 11 and amax > MAX_Q:
            continue
        b = band_bits(q, book)
        if best is None or b < best[1]:
            best = (book, b)
    return best


def _write_spectral(bw, q, book):
    dim, signed, lav = BOOK_META[book]
    bits, codes = SPEC_BITS[book], SPEC_CODES[book]
    for i in range(0, len(q), dim):
        seg = [int(v) for v in q[i:i + dim]]
        if signed:
            idx = 0
            for v in seg:
                idx = idx * (2 * lav + 1) + (v + lav)
            bw.put(int(codes[idx]), int(bits[idx]))
        else:
            idx = 0
            for v in seg:
                idx = idx * (lav + 1) + min(abs(v), lav)
            bw.put(int(codes[idx]), int(bits[idx]))
            for v in seg:
                if v:
                    bw.put(1 if v < 0 else 0, 1)
            if book == 11:
                for v in seg:
                    a = abs(v)
                    if a >= 16:
                        n = a.bit_length() - 1
                        bw.put((1 << (n - 4)) - 1, n - 4)  # n-4 ones
                        bw.put(0, 1)
                        bw.put(a - (1 << n), n)


class Encoder:
    def __init__(self, sample_rate=16000, bitrate=32000, cutoff_hz=None):
        assert sample_rate in (16000, 8000)
        self.fs = sample_rate
        self.fs_key = {16000: "16", 8000: "8"}[sample_rate]
        self.sfi = {16000: 8, 8000: 11}[sample_rate]
        self.bitrate = bitrate
        self.swb = _T["swb"][f"long_{self.fs_key}"]
        kbps = bitrate / 1000.0
        if cutoff_hz is None:
            cutoff_hz = min(0.47 * self.fs, 650.0 * kbps ** 0.78)
        binw = self.fs / 2048.0
        cut_bin = int(cutoff_hz / binw)
        self.max_sfb = 1
        for b in range(len(self.swb) - 1):
            if self.swb[b] < cut_bin:
                self.max_sfb = b + 1
        self.prev = np.zeros(1024)
        self.frame_bits_mean = bitrate * 1024.0 / sample_rate
        self.reservoir = 0.0

    # ---------------- psychoacoustic-lite noise targets ----------------
    def _noise_targets(self, X):
        """Allowed noise energy per band: band energy over an SNR ladder
        with spreading to neighbours and an absolute floor."""
        nb = self.max_sfb
        e = np.array([np.sum(X[self.swb[b]:self.swb[b + 1]] ** 2) + 1e-9
                      for b in range(nb)])
        # masking skeleton: each band masks itself at -snr dB, spread +-1
        # band at extra -12 dB
        snr_db = 17.0
        mask = e * 10.0 ** (-snr_db / 10.0)
        spread = np.maximum(
            np.concatenate([[0.0], mask[:-1]]) * 10.0 ** (-1.2),
            np.concatenate([mask[1:], [0.0]]) * 10.0 ** (-1.2))
        return np.maximum(np.maximum(mask, spread), 1e-2)

    def _count_bits(self, q_bands, sfs, books):
        """ics bit cost (section+sf+spectral), given per-band data."""
        bits = 8 + 1 + 2 + 1 + 6 + 1  # gg + ics_info long
        # sections: merge adjacent equal books
        sect = []
        for b in range(self.max_sfb):
            if sect and sect[-1][0] == books[b]:
                sect[-1][1] += 1
            else:
                sect.append([books[b], 1])
        for cb, ln in sect:
            bits += 4 + 5 * (1 + ln // 31)
        # scalefactors: dpcm chain seeded at global_gain (= first band's
        # sf, so the first delta is 0), one code per non-zero band
        last = None
        for b in range(self.max_sfb):
            if books[b] == 0:
                continue
            if last is None:
                last = sfs[b]  # global gain seeds the chain
            d = sfs[b] - last
            if not -60 <= d <= 60:
                return None
            bits += int(SF_BITS[d + 60])
            last = sfs[b]
        bits += 1 + 1 + 1  # pulse/tns/gain-control presence
        for b in range(self.max_sfb):
            if books[b]:
                bits += band_bits(q_bands[b], books[b])
        return bits

    def encode_frame(self, pcm1024: np.ndarray) -> bytes:
        """One ADTS frame from 1024 new samples (float, int16 scale)."""
        frame = np.concatenate([self.prev, pcm1024])
        self.prev = pcm1024.copy()
        X = mdct(frame * _WIN)

        nb = self.max_sfb
        targets = self._noise_targets(X)
        budget = self.frame_bits_mean + self.reservoir - 7 * 8 - 3 - 3
        budget = max(budget, 200.0)

        # start: common sf that keeps the global max in quantizer range
        amax = np.abs(X).max() + 1e-9
        sf0 = int(np.ceil(4.0 * np.log2(amax / (MAX_Q - 100) ** (4.0 / 3.0))
                          )) + SF_OFFSET
        sf0 = int(np.clip(sf0, 0, 255))
        sfs = np.full(nb, sf0, np.int32)

        # outer distortion loop with inner rate loop
        for _ in range(60):
            q_bands, books, used = self._quant_all(X, sfs)
            if used is None:
                sfs += 1
                continue
            if used > budget:
                # rate too high: coarsen the band with most headroom?
                # simple: raise all sfs by 1 (uniform coarsening)
                sfs = np.minimum(sfs + 1, 255)
                continue
            # distortion check: amplify violating bands
            err = self._band_err(X, q_bands, sfs)
            viol = [b for b in range(nb)
                    if err[b] > targets[b] and sfs[b] > 0 and
                    np.abs(X[self.swb[b]:self.swb[b + 1]]).max() > 0]
            if not viol:
                break
            # estimate slack: only amplify if it plausibly fits
            if used > budget * 0.98:
                break
            for b in viol:
                sfs[b] -= 1
        q_bands, books, used = self._quant_all(X, sfs)
        body = self._write_frame(q_bands, sfs, books)
        self.reservoir = min(self.reservoir + self.frame_bits_mean
                             - len(body) * 8, 4.0 * self.frame_bits_mean)
        return body

    def _quant_all(self, X, sfs):
        q_bands, books = [], []
        for b in range(self.max_sfb):
            xb = X[self.swb[b]:self.swb[b + 1]]
            q = quantize(xb, sfs[b])
            if np.abs(q).max() > MAX_Q:
                return None, None, None
            book, _ = best_book(q)
            q_bands.append(q)
            books.append(book)
        used = self._count_bits(q_bands, sfs, books)
        return q_bands, books, used

    def _band_err(self, X, q_bands, sfs):
        err = np.zeros(self.max_sfb)
        for b in range(self.max_sfb):
            xb = X[self.swb[b]:self.swb[b + 1]]
            rec = dequantize(q_bands[b], sfs[b])
            err[b] = np.sum((xb - rec) ** 2)
        return err

    def _write_frame(self, q_bands, sfs, books) -> bytes:
        bw = BitWriter()
        # find global gain = first transmitted sf (or sf0 if all zero)
        gg = None
        for b in range(self.max_sfb):
            if books[b]:
                gg = int(sfs[b])
                break
        if gg is None:
            gg = int(sfs[0])
        body = BitWriter()
        body.put(0, 3)  # SCE
        body.put(0, 4)  # tag
        body.put(gg, 8)
        body.put(0, 1)  # ics_reserved
        body.put(0, 2)  # ONLY_LONG
        body.put(0, 1)  # sine window
        body.put(self.max_sfb, 6)
        body.put(0, 1)  # predictor_data_present
        # section_data
        sect = []
        for b in range(self.max_sfb):
            if sect and sect[-1][0] == books[b]:
                sect[-1][1] += 1
            else:
                sect.append([books[b], 1])
        for cb, ln in sect:
            body.put(cb, 4)
            while ln >= 31:
                body.put(31, 5)
                ln -= 31
            body.put(ln, 5)
        # scale_factor_data: chain seeded at global_gain, a dpcm code for
        # every non-zero band (first is delta 0 since gg = first band sf)
        last = gg
        for b in range(self.max_sfb):
            if books[b] == 0:
                continue
            d = int(sfs[b]) - last
            body.put(int(SF_CODES[d + 60]), int(SF_BITS[d + 60]))
            last = int(sfs[b])
        body.put(0, 1)  # pulse
        body.put(0, 1)  # tns
        body.put(0, 1)  # gain control
        for b in range(self.max_sfb):
            if books[b]:
                _write_spectral(body, q_bands[b], books[b])
        body.put(7, 3)  # END
        body.align()
        payload = body.bytes()
        # ADTS header (7 bytes, no CRC)
        flen = len(payload) + 7
        bw.put(0xFFF, 12)
        bw.put(0, 1)   # MPEG-4
        bw.put(0, 2)   # layer
        bw.put(1, 1)   # protection_absent
        bw.put(1, 2)   # profile: AAC-LC
        bw.put(self.sfi, 4)
        bw.put(0, 1)
        bw.put(1, 3)   # mono
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(flen, 13)
        bw.put(0x7FF, 11)
        bw.put(0, 2)
        return bw.bytes() + payload


def encode(pcm: np.ndarray, bitrate=32000, sample_rate=16000) -> bytes:
    enc = Encoder(sample_rate, bitrate)
    x = np.asarray(pcm, np.float64)
    n = (len(x) // 1024) * 1024
    out = bytearray()
    for i in range(0, n, 1024):
        out += enc.encode_frame(x[i:i + 1024])
    out += enc.encode_frame(np.zeros(1024))  # flush overlap
    return bytes(out)


def split_adts(data: bytes) -> list[bytes]:
    pkts = []
    i = 0
    while i + 7 <= len(data):
        assert data[i] == 0xFF and (data[i + 1] & 0xF6) == 0xF0
        flen = ((data[i + 3] & 0x03) << 11) | (data[i + 4] << 3) | \
            (data[i + 5] >> 5)
        pkts.append(data[i:i + flen])
        i += flen
    return pkts
