"""Learn the short-block scalefactor-band tables (sfbIndexShort) and the
short-block big-values region boundary by probing libmpg123.

Short-block spectra are stored scalefactor-band-major: for each short
band b (width W_b): W_b lines of window 0, then window 1, then window 2.
A single unit value at stored position p (placed with count1-B quads, as
in the long-block learners) therefore decodes into ONE of the three short
windows — identifiable by the TIME of the decoded spike (windows are 192
output samples apart). Walking p and detecting the window-2 -> window-0
resets recovers every band width; 3 * sum(W_b) == 576 validates.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from packer import BitWriter, BR1, SR1, BR2, SR2
from oracle import mpg123_decode

_HERE = os.path.dirname(os.path.abspath(__file__))


def frame(mpeg, sr, kbps, gr_specs):
    """Frame packer supporting window_switching granules."""
    if mpeg == 1:
        bidx, sridx, per, side_granules = BR1.index(kbps), SR1[sr], 144, 2
    else:
        bidx, sridx, per, side_granules = BR2.index(kbps), SR2[sr], 72, 1
    frame_len = per * kbps * 1000 // sr
    w = BitWriter()
    w.put(0x7FF, 11)
    w.put(3 if mpeg == 1 else 2, 2)
    w.put(1, 2)
    w.put(1, 1)
    w.put(bidx, 4)
    w.put(sridx, 2)
    w.put(0, 1)
    w.put(0, 1)
    w.put(3, 2)
    w.put(0, 2)
    w.put(0, 1)
    w.put(1, 1)
    w.put(0, 2)
    if mpeg == 1:
        w.put(0, 9)
        w.put(0, 5)
        w.put(0, 4)
    else:
        w.put(0, 8)
        w.put(0, 1)
    for g in gr_specs:
        w.put(g["part2_3_length"], 12)
        w.put(g["big_values"], 9)
        w.put(g["global_gain"], 8)
        w.put(g.get("scalefac_compress", 0), 4 if mpeg == 1 else 9)
        ws = g.get("window_switching", 0)
        w.put(ws, 1)
        if ws:
            w.put(g.get("block_type", 2), 2)
            w.put(g.get("mixed", 0), 1)
            for t in g["table_select"][:2]:
                w.put(t, 5)
            for sb in g.get("subblock_gain", (0, 0, 0)):
                w.put(sb, 3)
        else:
            for t in g["table_select"]:
                w.put(t, 5)
            w.put(g.get("region0_count", 7), 4)
            w.put(g.get("region1_count", 7), 3)
        if mpeg == 1:
            w.put(g.get("preflag", 0), 1)
        w.put(g.get("scalefac_scale", 0), 1)
        w.put(g.get("count1table_select", 0), 1)
    for g in gr_specs:
        w.put_bits(g.get("maindata", ""))
    w.pad_to_bytes(frame_len)
    return w.tobytes()


SILENT = {"part2_3_length": 0, "big_values": 0, "global_gain": 210,
          "table_select": [0, 0, 0], "maindata": ""}


def probe(mpeg, sr, md, big_values=0, tables=(0, 0), kbps=None):
    kbps = kbps or (64 if mpeg == 1 else 64)
    gr = {"part2_3_length": len(md), "big_values": big_values,
          "global_gain": 210, "table_select": [tables[0], tables[1], 0],
          "window_switching": 1, "block_type": 2,
          "count1table_select": 1, "maindata": md}
    sil = frame(mpeg, sr, kbps, [dict(SILENT)] * (2 if mpeg == 1 else 1))
    prb = frame(mpeg, sr, kbps,
                [gr] + ([dict(SILENT)] if mpeg == 1 else []))
    return mpg123_decode(sil * 2 + prb + sil * 3)[0]


def centroid_of(mpeg, sr, pos):
    """Energy centroid time of the spike decoded from stored position
    `pos` (short windows are 192 output samples apart; the centroid is
    frequency-insensitive, unlike the raw peak time)."""
    j, slot = divmod(pos, 4)
    quad = ["1"] * 4
    quad[slot] = "0"
    md = "1111" * j + "".join(quad) + "0"
    pcm = probe(mpeg, sr, md)
    e = np.abs(pcm.astype(np.float64)) ** 2
    if e.max() < 1e-5:
        return None
    return float(np.sum(np.arange(len(e)) * e) / np.sum(e))


def learn_sfb_short(mpeg, sr):
    """Scan stored positions; a window transition shows as a large
    POSITIVE centroid jump (+192 minus the small in-band line drift)
    between consecutive positions. Band width = distance between the
    window-0 -> window-1 transitions; cross-checked against the
    window-1 -> window-2 transition of the same band."""
    widths = []
    pos = 0
    c_prev = centroid_of(mpeg, sr, pos)
    while pos < 576 and len(widths) < 13:
        W = None
        k = 0
        c_here = c_prev
        while pos + k + 1 < 576:
            c_next = centroid_of(mpeg, sr, pos + k + 1)
            k += 1
            if c_next - c_here > 96.0:   # window jump
                W = k
                break
            c_here = c_next
        if W is None:
            W = (576 - pos) // 3  # last band: no further transition needed
            widths.append(W)
            pos += 3 * W
            break
        # confirm the window-1 -> window-2 transition at the same width
        c_w1_last = centroid_of(mpeg, sr, pos + 2 * W - 1)
        c_w2_first = centroid_of(mpeg, sr, pos + 2 * W)
        assert c_w2_first - c_w1_last > 96.0, (pos, W)
        widths.append(W)
        pos += 3 * W
        c_prev = centroid_of(mpeg, sr, pos) if pos < 576 else None
    assert pos == 576, (pos, widths)
    bounds = [0]
    for w in widths:
        bounds.append(bounds[-1] + w)
    assert bounds[-1] == 192, bounds
    return bounds


def learn_short_region_boundary(mpeg, sr, code11):
    """Short-block big-values region0/region1 boundary (in stored
    coefficients): region0 coded with table 1, region1 with table 0 —
    count decodable units (no-overrun binary search, as in learn_aux)."""
    unit = code11 + "00"

    def ok(M):
        if M == 0:
            return False
        pcm = probe(mpeg, sr, unit * M, big_values=288, tables=(1, 0))
        return np.abs(pcm).max() > 5e-3

    lo, hi = 0, 290
    while lo + 1 < hi:
        mid = (lo + hi) // 2
        if ok(mid):
            hi = mid
        else:
            lo = mid
    return 2 * hi


if __name__ == "__main__":
    import json

    out_path = os.path.join(_HERE, "learned/aux_tables.json")
    out = json.load(open(out_path)) if os.path.exists(out_path) else {}
    tables = json.load(open(os.path.join(_HERE, "learned/tables.json")))
    code11 = tables["1"]["codes"]["1,1"]
    for mpeg, sr in ((1, 32000), (1, 44100), (1, 48000),
                     (2, 16000), (2, 22050), (2, 24000)):
        sfb = learn_sfb_short(mpeg, sr)
        rb = learn_short_region_boundary(mpeg, sr, code11)
        out[f"sfb_short_{mpeg}_{sr}"] = sfb
        out[f"short_region0_{mpeg}_{sr}"] = rb
        print(f"sfb_short mpeg{mpeg} {sr}: {sfb} region0_end={rb}",
              flush=True)
    json.dump(out, open(out_path, "w"), indent=0)
