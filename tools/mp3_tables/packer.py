"""Minimal Layer III frame packer for probing mpg123 (table learning)."""
import numpy as np


class BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, val, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def put_bits(self, bitstr):
        for ch in bitstr:
            self.bits.append(1 if ch == "1" else 0)

    def pad_to_bytes(self, nbytes, fill=0):
        assert len(self.bits) <= nbytes * 8, (len(self.bits), nbytes * 8)
        while len(self.bits) < nbytes * 8:
            self.bits.append(fill)

    def tobytes(self):
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | self.bits[i + j]
            out.append(b)
        return bytes(out)


# MPEG-1 Layer III bitrate table (kbps), index 1..14
BR1 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
SR1 = {44100: 0, 48000: 1, 32000: 2}
# MPEG-2 LSF Layer III bitrates
BR2 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
SR2 = {22050: 0, 24000: 1, 16000: 2}


def mpeg1_frame(sr, kbps, gr_specs):
    """gr_specs: list of 2 dicts with keys part2_3_length, big_values,
    global_gain, table_select (3-list), region0_count, region1_count,
    count1table_select, maindata (bitstring).  Mono, main_data_begin=0."""
    bidx = BR1.index(kbps)
    frame_len = 144 * kbps * 1000 // sr  # no padding
    w = BitWriter()
    # header
    w.put(0x7FF, 11); w.put(3, 2); w.put(1, 2); w.put(1, 1)  # sync,MPEG1,L3,nocrc
    w.put(bidx, 4); w.put(SR1[sr], 2); w.put(0, 1); w.put(0, 1)  # br,sr,pad,priv
    w.put(3, 2); w.put(0, 2); w.put(0, 1); w.put(1, 1); w.put(0, 2)  # mono,ext,copy,orig,emph
    # side info (17 bytes mono)
    w.put(0, 9)   # main_data_begin
    w.put(0, 5)   # private
    w.put(0, 4)   # scfsi
    for g in gr_specs:
        w.put(g["part2_3_length"], 12)
        w.put(g["big_values"], 9)
        w.put(g["global_gain"], 8)
        w.put(g.get("scalefac_compress", 0), 4)
        w.put(0, 1)  # window_switching_flag
        for t in g["table_select"]:
            w.put(t, 5)
        w.put(g.get("region0_count", 7), 4)
        w.put(g.get("region1_count", 7), 3)
        w.put(g.get("preflag", 0), 1)
        w.put(g.get("scalefac_scale", 0), 1)
        w.put(g.get("count1table_select", 0), 1)
    # main data
    for g in gr_specs:
        w.put_bits(g.get("maindata", ""))
        assert len(g.get("maindata", "")) == g["part2_3_length"]
    w.pad_to_bytes(frame_len)
    return w.tobytes()


def mpeg2_frame(sr, kbps, g):
    """MPEG-2 LSF mono frame: 1 granule, 9-byte side info."""
    bidx = BR2.index(kbps)
    frame_len = 72 * kbps * 1000 // sr
    w = BitWriter()
    w.put(0x7FF, 11); w.put(2, 2); w.put(1, 2); w.put(1, 1)  # sync,MPEG2,L3,nocrc
    w.put(bidx, 4); w.put(SR2[sr], 2); w.put(0, 1); w.put(0, 1)
    w.put(3, 2); w.put(0, 2); w.put(0, 1); w.put(1, 1); w.put(0, 2)
    w.put(0, 8)   # main_data_begin
    w.put(0, 1)   # private
    w.put(g["part2_3_length"], 12)
    w.put(g["big_values"], 9)
    w.put(g["global_gain"], 8)
    w.put(g.get("scalefac_compress", 0), 9)
    w.put(0, 1)  # window_switching_flag
    for t in g["table_select"]:
        w.put(t, 5)
    w.put(g.get("region0_count", 7), 4)
    w.put(g.get("region1_count", 7), 3)
    w.put(g.get("scalefac_scale", 0), 1)
    w.put(g.get("count1table_select", 0), 1)
    w.put_bits(g.get("maindata", ""))
    assert len(g.get("maindata", "")) == g["part2_3_length"]
    w.pad_to_bytes(frame_len)
    return w.tobytes()


SILENT1 = {"part2_3_length": 0, "big_values": 0, "global_gain": 210,
           "table_select": [0, 0, 0], "maindata": ""}


def probe_stream_mpeg1(sr, kbps, gr, n_lead=2, n_tail=3):
    """silent frames, one frame with [gr, silent], silent frames."""
    silent = mpeg1_frame(sr, kbps, [SILENT1, SILENT1])
    probe = mpeg1_frame(sr, kbps, [gr, SILENT1])
    return silent * n_lead + probe + silent * n_tail


def probe_stream_mpeg2(sr, kbps, gr, n_lead=2, n_tail=3):
    silent = mpeg2_frame(sr, kbps, dict(SILENT1))
    probe = mpeg2_frame(sr, kbps, gr)
    return silent * n_lead + probe + silent * n_tail
