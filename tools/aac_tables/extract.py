"""Recover the ISO/IEC 13818-7 AAC-LC tables from the in-image libavcodec
binary (ffmpeg 5.x, lavc 59.37) by structural search, for the from-scratch
codec in native/augment/aac.cc.

Nothing here trusts a remembered table: every candidate must pass hard
structural invariants (canonical prefix code, Kraft-complete, known entry
counts from the bitstream grammar), and the final arbiter is behavioral —
tools/aac_tables/decoder.py must bit-parse real lavc-encoded ADTS streams
and reproduce lavc's own PCM (tests/test_aac_conformance.py).

Tables sought:
  * scalefactor Huffman codebook: 121 entries (dpcm index -60..60)
  * 11 spectral Huffman books, sizes 81,81,81,81,81,81,64,64,169,169,289
  * swb_offset tables (long=1024, short=128 windows) per sample rate

Reference behavior: /root/reference/channel_simulation/
simulated_compression.py:11-13 (aac at 8/16/32 kbps).
"""

from __future__ import annotations

import json
import struct
import sys
from pathlib import Path

LIB = "/usr/lib/x86_64-linux-gnu/libavcodec.so.59.37.100"
OUT = Path(__file__).parent / "learned"

SPECTRAL_SIZES = [81, 81, 81, 81, 81, 81, 64, 64, 169, 169, 289]


def kraft(bits):
    return sum(2.0 ** -b for b in bits)


def is_prefix_free(codes, bits):
    """codes[i] stored right-aligned in bits[i] bits; check canonical
    prefix-freeness by left-aligning to 32 bits and sorting."""
    items = sorted((c << (32 - b), b) for c, b in zip(codes, bits))
    for (c1, b1), (c2, b2) in zip(items, items[1:]):
        if c2 >> (32 - b1) == c1 >> (32 - b1):
            return False
    return True


def find_scalefactor(data: bytes):
    """121-entry canonical Huffman code: uint8 bits[121] (1..19,
    Kraft-complete) with a matching uint32 codes[121] somewhere nearby."""
    n = 121
    cands = []
    for off in range(len(data) - n):
        seg = data[off:off + n]
        if not all(1 <= b <= 19 for b in seg):
            continue
        if abs(kraft(seg) - 1.0) > 1e-12:
            continue
        # avoid runs that are just part of a longer qualifying region
        cands.append((off, list(seg)))
    # pair each bits candidate with a uint32 code table within +-64KiB
    out = []
    for off, bits in cands:
        lo = max(0, off - 65536)
        for coff in range(lo, min(len(data) - 4 * n, off + 65536), 4):
            codes = struct.unpack_from("<121I", data, coff)
            if all(c < (1 << b) for c, b in zip(codes, bits)) and \
                    is_prefix_free(codes, bits):
                out.append({"bits_off": off, "codes_off": coff,
                            "bits": bits, "codes": list(codes)})
    return out


def _kraft_complete_windows(data: bytes, n: int):
    """All offsets where data[off:off+n] is uint8 in [1,20] with Kraft
    sum exactly 1 — vectorized."""
    import numpy as np
    a = np.frombuffer(data, np.uint8)
    bad = (a < 1) | (a > 20)
    badc = np.concatenate([[0], np.cumsum(bad)])
    w = np.where(bad, 0.0, 2.0 ** -a.astype(np.float64))
    cs = np.concatenate([[0.0], np.cumsum(w)])
    offs = np.arange(len(a) - n)
    valid = (badc[offs + n] - badc[offs]) == 0
    sums = cs[offs + n] - cs[offs]
    # float cumsum over 15MB accumulates error; confirm exactly per hit
    rough = valid & (np.abs(sums - 1.0) < 1e-6)
    return [int(o) for o in offs[rough]
            if abs(kraft(data[o:o + n]) - 1.0) < 1e-12]


def find_spectral(data: bytes):
    """Per-book uint8 bits[n] (Kraft-complete) + uint16 codes[n] nearby."""
    found = {}
    for book, n in enumerate(SPECTRAL_SIZES, start=1):
        hits = []
        for off in _kraft_complete_windows(data, n):
            bits = list(data[off:off + n])
            lo = max(0, off - 65536)
            for coff in range(lo, min(len(data) - 2 * n, off + 65536), 2):
                codes = struct.unpack_from(f"<{n}H", data, coff)
                if all(c < (1 << b) for c, b in zip(codes, bits)) and \
                        is_prefix_free(codes, bits):
                    hits.append({"bits_off": off, "codes_off": coff,
                                 "bits": bits, "codes": list(codes)})
        found[book] = hits
    return found


def find_swb(data: bytes):
    """uint16 monotonically increasing arrays 0,...,1024 (long) or
    0,...,128 (short), plausible scalefactor-band widths (multiples of 4)."""
    hits = {"long": [], "short": []}
    for kind, end, lo_n, hi_n in [("long", 1024, 20, 64),
                                  ("short", 128, 8, 20)]:
        for off in range(0, len(data) - 2, 2):
            if struct.unpack_from("<H", data, off)[0] != 0:
                continue
            seq = [0]
            p = off + 2
            ok = True
            while p + 2 <= len(data) and len(seq) <= hi_n + 1:
                v = struct.unpack_from("<H", data, p)[0]
                if v <= seq[-1] or v > end or (v - seq[-1]) % 4 != 0:
                    ok = False if v != end else ok
                    if v == end and v > seq[-1] and (v - seq[-1]) % 4 == 0:
                        seq.append(v)
                        ok = True
                    break
                seq.append(v)
                p += 2
                if v == end:
                    break
            if ok and seq[-1] == end and lo_n <= len(seq) - 1 <= hi_n:
                hits[kind].append({"off": off, "offsets": seq})
    return hits


def main():
    data = Path(LIB).read_bytes()
    OUT.mkdir(exist_ok=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "sf"):
        sf = find_scalefactor(data)
        print(f"scalefactor candidates: {len(sf)}")
        (OUT / "scalefactor_candidates.json").write_text(json.dumps(sf))
    if which in ("all", "spec"):
        spec = find_spectral(data)
        for b, h in spec.items():
            print(f"book {b} (n={SPECTRAL_SIZES[b-1]}): {len(h)} candidates")
        (OUT / "spectral_candidates.json").write_text(json.dumps(spec))
    if which in ("all", "swb"):
        swb = find_swb(data)
        print(f"swb long candidates: {len(swb['long'])}, "
              f"short: {len(swb['short'])}")
        (OUT / "swb_candidates.json").write_text(json.dumps(swb))


if __name__ == "__main__":
    main()
