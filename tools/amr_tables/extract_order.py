"""Extract the per-mode AMR-NB bit-order maps from the in-image lavc
binary and cross-check mode 7 (MR122) against the behaviorally probed
map (FACTS.md / amrnb_tables.h) — the Rosetta stone that pinned the
format.

Recovered format (confirmed by matching the probed MR122 map field by
field): the amrnb FFCodec struct in .data.rel.ro is followed by the
8-pointer array `amr_unpacking_bitmaps_per_mode`; each table is a
sequence of fields { nbits, byte_offset_into_frame_struct,
bit_index[nbits] } where bit_index b addresses payload bit
`data[b>>3] >> (b&7) & 1`, i.e. storage (RFC 4867 d-bit) index
s = (b & ~7) | (7 - (b & 7)); the field value is assembled MSB-first
in list order. Frame struct layout (uint16 fields): lsf[0..4] at byte
offsets 0,2,4,6,8; subframe k at 10+26k with p_lag, p_gain,
fixed_gain, pulses[10].

Output: learned/order_maps.json with, per mode, the field list
[(name, subframe, storage_bits_msb_first)].
"""

from __future__ import annotations

import json
import os
import struct

LIB = "/usr/lib/x86_64-linux-gnu/libavcodec.so.59.37.100"
HERE = os.path.dirname(os.path.abspath(__file__))

MODE_NAMES = ["4k75", "5k15", "5k9", "6k7", "7k4", "7k95", "10k2", "12k2"]
MODE_BITS = [95, 103, 118, 134, 148, 159, 204, 244]


def find_tables(data: bytes):
    """Locate the 8 per-mode order tables via the amrnb FFCodec struct
    (found through its name-string pointer)."""
    name_off = data.find(b"amrnb\x00")
    assert name_off != -1
    # rodata segment is mapped at vaddr == file offset in this build;
    # verify by finding a quadword pointer to the string in the RW data.
    ptr = struct.pack("<Q", name_off)
    codec_off = -1
    j = data.find(ptr)
    while j != -1:
        # FFCodec: name at +0; check long_name pointer at +8 is a
        # plausible rodata pointer near the name.
        ln = struct.unpack_from("<Q", data, j + 8)[0]
        if abs(int(ln) - name_off) < 0x10000:
            codec_off = j
            break
        j = data.find(ptr, j + 1)
    assert codec_off != -1, "amrnb FFCodec struct not found"
    ptrs = struct.unpack_from("<8Q", data, codec_off + 256)
    assert all(0xAB4000 <= p < 0xDC9DB0 for p in ptrs), ptrs
    return list(ptrs)


def parse_table(data: bytes, off: int, total_bits: int):
    """Parse one order table into (name, subframe, storage_bits)."""
    fields = []
    seen = 0
    p = off
    while seen < total_bits:
        nbits = data[p]
        boff = data[p + 1]
        assert 1 <= nbits <= 16, (hex(off), hex(p), nbits)
        idxs = list(data[p + 2:p + 2 + nbits])
        p += 2 + nbits
        storage = [(b & ~7) | (7 - (b & 7)) for b in idxs]
        if boff < 10:
            name, sub = f"lsf{boff // 2}", -1
        else:
            sub = (boff - 10) // 26
            fo = (boff - 10) % 26
            name = {0: "p_lag", 2: "p_gain", 4: "fixed_gain"}.get(
                fo, f"pulse{(fo - 6) // 2}")
        fields.append({"name": name, "subframe": sub, "bits": storage})
        seen += nbits
    assert seen == total_bits, (hex(off), seen, total_bits)
    return fields


def main():
    data = open(LIB, "rb").read()
    ptrs = find_tables(data)
    out = {}
    for mode, (p, nb) in enumerate(zip(ptrs, MODE_BITS)):
        out[MODE_NAMES[mode]] = parse_table(data, p, nb)
    # Rosetta check: mode 7 vs the probed MR122 map
    m7 = {(f["name"], f["subframe"]): f["bits"] for f in out["12k2"]}
    assert m7[("lsf0", -1)] == [0, 1, 2, 3, 4, 5, 6]
    assert m7[("lsf2", -1)] == [16, 17, 18, 19, 20, 21, 22, 23, 15]
    assert m7[("p_lag", 0)] == [29, 31, 33, 35, 37, 39, 41, 43, 45]
    assert m7[("p_gain", 0)] == [47, 51, 55, 88]
    assert m7[("fixed_gain", 0)] == [59, 63, 67, 92, 104]
    path = os.path.join(HERE, "learned", "order_maps.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    for m in MODE_NAMES:
        fs = out[m]
        by = {}
        for f in fs:
            k = f["name"] if f["subframe"] < 0 else \
                f"{f['name']}[{f['subframe']}]"
            by[k] = len(f["bits"])
        print(f"{m}: {by}")


if __name__ == "__main__":
    main()
