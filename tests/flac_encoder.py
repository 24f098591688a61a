"""Minimal FLAC *encoder* used only as a test oracle for the native decoder.

Produces spec-conformant streams exercising every subframe type the decoder
supports: CONSTANT, VERBATIM, FIXED (orders 0-2), and LPC, with Rice-coded
residuals, in mono or stereo (independent / left-side / mid-side). CRCs are
computed properly so files are valid for any decoder.
"""

from __future__ import annotations

import struct

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.acc & 0xFF)
                self.acc = 0
                self.nbits = 0

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        while self.nbits:
            self.write(0, 1)

    def data(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _rice_encode(bw: BitWriter, residuals, param: int):
    for r in residuals:
        u = (abs(int(r)) << 1) - (1 if r < 0 else 0)  # zigzag
        bw.write_unary(u >> param)
        bw.write(u & ((1 << param) - 1), param)


def _best_rice_param(residuals) -> int:
    if len(residuals) == 0:
        return 0
    mean = max(1.0, float(np.mean(np.abs(residuals))))
    return int(np.clip(np.ceil(np.log2(mean + 1)), 0, 14))


def _write_residual(bw: BitWriter, residuals):
    bw.write(0, 2)   # rice method 0 (4-bit params)
    bw.write(0, 4)   # partition order 0
    param = _best_rice_param(residuals)
    bw.write(param, 4)
    _rice_encode(bw, residuals, param)


def encode_subframe(bw: BitWriter, samples: np.ndarray, bps: int, kind: str):
    bw.write(0, 1)  # padding
    x = samples.astype(np.int64)
    if kind == "constant":
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(x[0]), bps)
    elif kind == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.write_signed(int(v), bps)
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        coefs = {0: [], 1: [1], 2: [2, -1]}[order]
        res = []
        for i in range(order, len(x)):
            pred = sum(c * int(x[i - 1 - j]) for j, c in enumerate(coefs))
            res.append(int(x[i]) - pred)
        _write_residual(bw, res)
    elif kind == "lpc":
        order = 4
        precision = 12
        shift = 10
        # LPC analysis via least squares, quantized
        if len(x) <= order + 4:
            raise ValueError("block too short for lpc test")
        A = np.stack([x[order - 1 - j:len(x) - 1 - j] for j in range(order)], 1)
        b = x[order:]
        coef, *_ = np.linalg.lstsq(A.astype(np.float64), b.astype(np.float64),
                                   rcond=None)
        q = np.clip(np.round(coef * (1 << shift)), -(1 << (precision - 1)),
                    (1 << (precision - 1)) - 1).astype(np.int64)
        bw.write(32 + (order - 1), 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in q:
            bw.write_signed(int(c), precision)
        res = []
        for i in range(order, len(x)):
            pred = sum(int(q[j]) * int(x[i - 1 - j]) for j in range(order)) >> shift
            res.append(int(x[i]) - pred)
        _write_residual(bw, res)
    else:
        raise ValueError(kind)


def encode_flac(pcm: np.ndarray, sample_rate: int = 16000, bps: int = 16,
                block_size: int = 4096, kind: str = "fixed2",
                stereo_mode: str = "independent") -> bytes:
    """pcm: (n,) mono or (n, 2) stereo int array."""
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, nch = pcm.shape

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n & ((1 << 36) - 1), 36)
    for _ in range(16):
        si.write(0, 8)
    body = si.data()
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    frame_no = 0
    for start in range(0, n, block_size):
        blk = pcm[start:start + block_size]
        bs = blk.shape[0]
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)       # reserved
        bw.write(0, 1)       # fixed blocksize strategy
        bw.write(7, 4)       # block size: 16-bit at end
        bw.write(0, 4)       # sample rate: from STREAMINFO
        if nch == 1 or stereo_mode == "independent":
            bw.write(nch - 1, 4)
        else:
            bw.write({"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode], 4)
        bw.write(4, 3)       # bps 16
        bw.write(0, 1)       # reserved
        assert frame_no < 0x80
        bw.write(frame_no, 8)   # UTF-8 frame number (single byte)
        bw.write(bs - 1, 16)
        # header so far is byte-aligned (32 bits + 8 + 16)
        hdr_bytes = bytes(bw.bytes)
        bw.write(crc8(hdr_bytes), 8)

        if nch == 1 or stereo_mode == "independent":
            for c in range(nch):
                encode_subframe(bw, blk[:, c], bps, kind)
        elif stereo_mode == "left_side":
            side = blk[:, 0].astype(np.int64) - blk[:, 1].astype(np.int64)
            encode_subframe(bw, blk[:, 0], bps, kind)
            encode_subframe(bw, side, bps + 1, kind)
        elif stereo_mode == "right_side":
            side = blk[:, 0].astype(np.int64) - blk[:, 1].astype(np.int64)
            encode_subframe(bw, side, bps + 1, kind)
            encode_subframe(bw, blk[:, 1], bps, kind)
        else:  # mid_side
            l = blk[:, 0].astype(np.int64)
            r = blk[:, 1].astype(np.int64)
            mid = (l + r) >> 1
            side = l - r
            encode_subframe(bw, mid, bps, kind)
            encode_subframe(bw, side, bps + 1, kind)
        bw.align()
        frame_bytes = bytes(bw.bytes)
        bw.write(crc16(frame_bytes), 16)
        out += bw.data()
        frame_no += 1

    return bytes(out)
