"""Float-precision black-box oracle over the in-image lavc `amrnb` /
`amrwb` decoders, for 3GPP table recovery by behavioral probing (the
mp3/aac route — see tools/mp3_tables/README.md).

Only observable input/output behavior of the system library is used: we
craft AMR frames bit by bit, decode them on a FRESH decoder instance
(known zero initial state), and read back the float PCM before any int16
quantization. No decoder code or data is read.

Frame format: one octet-aligned storage frame per packet — TOC byte
((FT << 3) | 0x04) followed by the packed class-ordered speech bits,
MSB-first (RFC 4867 §5.3).
"""

from __future__ import annotations

import ctypes as C
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from asvspoof2021_air_tpu.interop import avcodec as A  # noqa: E402

# Octet-aligned storage frame sizes (bytes incl. TOC) and speech bit counts
# for AMR-NB modes 0..7 (4.75 .. 12.2 kbps) + SID(8).
NB_SIZES = [13, 14, 16, 18, 20, 21, 27, 32, 6]
NB_BITS = [95, 103, 118, 134, 148, 159, 204, 244, 39]
# AMR-WB modes 0..8 (6.6 .. 23.85 kbps) + SID(9).
WB_SIZES = [18, 24, 33, 37, 41, 47, 51, 59, 61, 6]
WB_BITS = [132, 177, 253, 285, 317, 365, 397, 461, 477, 40]


def pack_frame(mode: int, bits, wb: bool = False) -> bytes:
    """Pack a bit list (ints 0/1, MSB-first order) into one storage frame."""
    sizes, nbits = (WB_SIZES, WB_BITS) if wb else (NB_SIZES, NB_BITS)
    n = nbits[mode]
    bits = list(bits)
    assert len(bits) == n, (len(bits), n)
    payload = bytearray(sizes[mode] - 1)
    for i, b in enumerate(bits):
        if b:
            payload[i >> 3] |= 0x80 >> (i & 7)
    return bytes([(mode << 3) | 0x04]) + bytes(payload)


class Decoder:
    """A fresh lavc decoder instance returning float32 PCM per frame."""

    def __init__(self, codec: str = "amrnb", rate: int = 8000):
        av, avu = A._load()
        dec = av.avcodec_find_decoder_by_name(codec.encode())
        if not dec:
            raise A.OracleUnavailable(f"no decoder {codec}")
        ctx = av.avcodec_alloc_context3(dec)
        avu.av_opt_set_int(C.c_void_p(ctx), b"ar", rate,
                           A.AV_OPT_SEARCH_CHILDREN)
        avu.av_opt_set_int(C.c_void_p(ctx), b"ac", 1,
                           A.AV_OPT_SEARCH_CHILDREN)
        if av.avcodec_open2(ctx, dec, None) != 0:
            raise A.OracleUnavailable(f"open {codec}")
        self.av, self.avu, self.ctx = av, avu, ctx
        self.frame = avu.av_frame_alloc()

    def decode(self, pkt_bytes: bytes) -> np.ndarray:
        av, avu = self.av, self.avu
        pkt = av.av_packet_alloc()
        av.av_new_packet(pkt, len(pkt_bytes))
        C.memmove(A._get_ptr(pkt, A.PKT_DATA), pkt_bytes, len(pkt_bytes))
        rc = av.avcodec_send_packet(self.ctx, pkt)
        if rc != 0:
            av.av_packet_unref(pkt)
            raise RuntimeError(f"send_packet rc={rc}")
        out = []
        while av.avcodec_receive_frame(self.ctx, self.frame) == 0:
            nb = A._get_i32(self.frame, A.FRM_NB_SAMPLES)
            d0 = A._get_ptr(self.frame, A.FRM_DATA0)
            fmt = A._get_i32(self.frame, A.FRM_FORMAT)
            if fmt in (3, 8):  # FLT / FLTP
                out.append(np.frombuffer(
                    C.string_at(d0, nb * 4), np.float32).copy())
            elif fmt in (1, 6):  # S16 / S16P
                out.append(np.frombuffer(
                    C.string_at(d0, nb * 2),
                    np.int16).astype(np.float32) / 32768.0)
            else:
                raise RuntimeError(f"sample fmt {fmt}")
            avu.av_frame_unref(self.frame)
        av.av_packet_unref(pkt)
        return (np.concatenate(out) if out
                else np.zeros(0, np.float32))


def decode_frames(frames, codec: str = "amrnb",
                  rate: int = 8000) -> np.ndarray:
    """Decode a list of storage frames on a FRESH decoder -> float32 PCM."""
    d = Decoder(codec, rate)
    return np.concatenate([d.decode(f) for f in frames])


def decode_bits(mode: int, bit_frames, codec: str = "amrnb") -> np.ndarray:
    wb = codec == "amrwb"
    rate = 16000 if wb else 8000
    return decode_frames([pack_frame(mode, b, wb) for b in bit_frames],
                         codec, rate)
