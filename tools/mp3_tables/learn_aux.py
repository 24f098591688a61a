"""Learn count1 table A, sfBandIndex tables, and the synthesis window,
by probing libmpg123 (companion to learn3.py).

count1-A: the count1 region parses tolerantly (partial quads decode as
sign bits arrive).  For a candidate prefix p: a spike appears at exactly
one appended zero iff p is a complete quad code with >=1 nonzero value
(the first sign materializes the first nonzero).  The all-zero quad is the
one remaining leaf (Kraft).

sfBandIndex: region0 with a known Huffman table and region1/2 with table 0
(zero bits).  The decoder reads exactly (sfbIndex[r0+1]/2) pair codes from
the bit stream; supplying M complete codes with EXACT part2_3_length
errors out (silence) iff M < needed.  Binary search the smallest M with
output -> boundary = 2*M.
"""
import os
import sys
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from packer import probe_stream_mpeg1, probe_stream_mpeg2
from oracle import mpg123_decode

import os
_HERE = os.path.dirname(os.path.abspath(__file__))

GG = 210
EPS = 5e-3


def decode1(bits, big_values, table_sel, r0=7, r1=7, count1table=1,
            sr=32000, kbps=64):
    gr = {"part2_3_length": len(bits), "big_values": big_values,
          "global_gain": GG, "table_select": list(table_sel),
          "region0_count": r0, "region1_count": r1,
          "count1table_select": count1table, "maindata": bits}
    return mpg123_decode(probe_stream_mpeg1(sr, kbps, gr))[0]


def decode2(bits, big_values, table_sel, r0=7, r1=7, count1table=1,
            sr=16000, kbps=64):
    gr = {"part2_3_length": len(bits), "big_values": big_values,
          "global_gain": GG, "table_select": list(table_sel),
          "region0_count": r0, "region1_count": r1,
          "count1table_select": count1table, "maindata": bits}
    return mpg123_decode(probe_stream_mpeg2(sr, kbps, gr))[0]


def nspikes(pcm, ref_energy=0.25):
    return float(np.abs(pcm).max())


# ---------------- count1 table A ----------------

def learn_count1A():
    # bases for coeffs 0..3 via verified table B
    raw = []
    for c in ("0111", "1011", "1101", "1110"):
        raw.append(decode1(c + "0", 0, (0, 0, 0), count1table=1))
    n = min(len(b) for b in raw)
    B = np.stack([x[:n].astype(np.float64) for x in raw], axis=1)
    proj = np.linalg.pinv(B)

    def probe(bits):
        return decode1(bits, 0, (0, 0, 0), count1table=0)

    def clean_contrib(d):
        """Project d onto bases 0..3; return (coeff, amp, is_clean)."""
        v = np.asarray(d[:n], np.float64)
        if len(v) < n:
            v = np.pad(v, (0, n - len(v)))
        a = proj @ v
        recon = B @ a
        resid = float(np.linalg.norm(v - recon) / (np.linalg.norm(v) + 1e-12))
        i = int(np.argmax(np.abs(a)))
        return i, float(a[i]), resid < 0.3

    leaves = {}
    stack = ["1", "0"]
    while stack:
        p = stack.pop()
        if len(p) > 8:
            continue
        first = probe(p + "0")
        if np.abs(first).max() <= EPS:
            stack.append(p + "0")
            stack.append(p + "1")
            continue
        # candidate complete quad code; materialize signs one at a time
        prev = probe(p)
        quad = [0, 0, 0, 0]
        ok = True
        for k in range(1, 5):
            cur = probe(p + "0" * k)
            m = min(len(cur), len(prev))
            d = cur[:m] - prev[:m]
            if np.abs(d).max() > EPS:
                i, amp, clean = clean_contrib(d)
                if not clean or abs(abs(amp) - 1.0) > 0.3 or quad[i]:
                    ok = False
                    break
                quad[i] = 1
            prev = cur
        if ok and any(quad):
            leaves[p] = tuple(quad)
        else:
            # mis-parse inside the zero-quad subtree: keep exploring
            stack.append(p + "0")
            stack.append(p + "1")

    def find_gap(prefix=""):
        """The unique uncovered subtree root (the zero-quad codeword)."""
        if prefix in leaves:
            return None
        if not any(q.startswith(prefix) for q in leaves):
            return prefix
        for b in ("0", "1"):
            g = find_gap(prefix + b)
            if g is not None:
                return g
        return None

    zp = find_gap()
    assert zp is not None
    leaves[zp] = (0, 0, 0, 0)
    kraft = sum(2.0 ** -len(q) for q in leaves)
    assert abs(kraft - 1.0) < 1e-9 and len(leaves) == 16, (kraft, len(leaves), sorted(leaves))
    return leaves


# ---------------- sfBandIndex ----------------

def learn_sfb(mpeg: int, sr: int, code11: str, kbps=64):
    """code11: a known table-1 codeword for pair (1,1) (2 sign bits appended
    makes a 1-pair unit).  Returns the 23-entry long-block sfBandIndex."""
    dec = decode1 if mpeg == 1 else decode2
    unit = code11 + "00"

    def region0_pairs(r0):
        # smallest M whose M-unit stream decodes (no overrun)
        lo, hi = 0, 290
        # boundary can't exceed 576/2 pairs; binary search on predicate
        # P(M) := decodes cleanly (pcm nonzero or boundary==0)
        def ok(M):
            if M == 0:
                # all-zero region0: can't distinguish; handle at caller
                return False
            pcm = dec(unit * M, 288, (1, 0, 0), r0=r0, sr=sr, kbps=kbps)
            return np.abs(pcm).max() > EPS
        while lo + 1 < hi:
            mid = (lo + hi) // 2
            if ok(mid):
                hi = mid
            else:
                lo = mid
        return hi

    def region1_pairs(r1):
        def ok(M):
            if M == 0:
                return False
            pcm = dec(unit * M, 288, (0, 1, 0), r0=15, r1=r1,
                      sr=sr, kbps=kbps)
            return np.abs(pcm).max() > EPS
        lo, hi = 0, 290
        while lo + 1 < hi:
            mid = (lo + hi) // 2
            if ok(mid):
                hi = mid
            else:
                lo = mid
        return hi

    sfb = [0] * 23
    for r0 in range(16):
        sfb[r0 + 1] = 2 * region0_pairs(r0)
    base = sfb[16]
    for r1 in range(6):
        # region1 ends at sfb[16+r1+1] when r0=15; r1=0..5 covers idx 17..22
        sfb[17 + r1] = base + 2 * region1_pairs(r1)
    return sfb


if __name__ == "__main__":
    import json
    import os
    out = json.load(open(_HERE + "/learned/aux_tables.json")) if os.path.exists(_HERE + "/learned/aux_tables.json") else {}
    if "count1a" in sys.argv:
        a = learn_count1A()
        out["count1A"] = {p: list(q) for p, q in a.items()}
        print("count1A:", sorted(a.items(), key=lambda kv: len(kv[0])))
    if "sfb" in sys.argv:
        t = json.load(open(_HERE + "/learned/tables.json"))
        code11 = t["1"]["codes"]["1,1"]
        for mpeg, sr in ((1, 32000), (1, 44100), (1, 48000),
                         (2, 16000), (2, 22050), (2, 24000)):
            sfb = learn_sfb(mpeg, sr, code11)
            out[f"sfb_{mpeg}_{sr}"] = sfb
            print(f"sfb mpeg{mpeg} {sr}:", sfb)
    json.dump(out, open(_HERE + "/learned/aux_tables.json", "w"), indent=0)
