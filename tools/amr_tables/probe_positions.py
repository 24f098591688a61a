"""Pin H6 — MR122 fixed-codebook position/sign coding — by DIRECT
excitation recovery (extract_exc.ChainInverter) instead of output-shape
matching.

Frame-1 probes with LSF/gp/gc bits all zero: gp = 0 (no adaptive
contribution, no sharpening), so exc = gc * code with code a sum of 10
signed unit pulses, two per track t in {0..4} at positions == t (mod 5).
Key invariant: two pulses of one track can never cancel (the TS 26.090
sign rule gives them the SAME sign when they coincide), so the integer
code vector per track is either one +-2 entry or two +-1 entries —
uniquely decodable back to (p0, p1, s).

Stage 1: 30 single-bit probes (applied to all four subframes at once)
         -> which pulse each bit belongs to and the value of that
            single-set-bit pattern.
Stage 2: per recovered 3-bit field, probe the remaining 4 bit patterns
         -> full 8-entry field-value -> track-offset map per pulse.
Stage 3: sign-bit probes on a split pair (p1 < p0) to pin the sign rule.

Writes learned/posmap_mr122.json.
"""

from __future__ import annotations

import json
import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from extract_exc import extract_stream  # noqa: E402
from oracle import NB_BITS, decode_bits  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))

# FACTS.md storage-order bit map (sf order as transmitted)
POS_BITS = [
    list(range(122, 137)) + list(range(182, 197)),
    list(range(137, 152)) + list(range(197, 212)),
    list(range(152, 167)) + list(range(212, 227)),
    list(range(167, 182)) + list(range(227, 242)),
]
SIGN_BITS = [[96 + k, 100 + k, 108 + k, 112 + k, 116 + k] for k in range(4)]


def probe(slots, sign_slots=()):
    """Set pos-bit slots (indices 0..29 into each subframe's pos list)
    and sign slots (0..4) in ALL four subframes; return the 4 integer
    code vectors."""
    bits = [0] * NB_BITS[7]
    for k in range(4):
        for s in slots:
            bits[POS_BITS[k][s]] = 1
        for s in sign_slots:
            bits[SIGN_BITS[k][s]] = 1
    pcm = decode_bits(7, [bits])[:160].astype(np.float64)
    exc, resids = extract_stream(pcm, [[0] * 5])
    assert max(resids) < 1e-4, resids
    codes = []
    for e in exc:
        # max|e| is gc (no coincidence on that track) or 2*gc; the valid
        # integer code has per-track either one +-2 or two +-1 entries
        # (abs-sum exactly 10)
        M = np.abs(e).max()
        q = None
        for g in (M, M / 2.0):
            qq = np.round(e / g).astype(int)
            if (np.abs(e / g - qq).max() < 0.2
                    and int(np.abs(qq).sum()) == 10):
                q = qq
                break
        assert q is not None, e / M
        codes.append(q)
    return codes


def decode_code(q):
    """Integer code -> per-track (p0, p1) with signs, assuming sign
    bit 0 (s=+1) unless the track total is negative."""
    tracks = {}
    for t in range(5):
        idx = [p for p in range(t, 40, 5) if q[p] != 0]
        vals = [q[p] for p in idx]
        if len(idx) == 1:
            assert abs(vals[0]) == 2, (t, idx, vals)
            tracks[t] = (idx[0], idx[0], int(np.sign(vals[0])))
        else:
            assert len(idx) == 2 and all(abs(v) == 1 for v in vals), (
                t, idx, vals)
            (pa, va), (pb, vb) = zip(idx, vals)
            if va == vb:          # same sign -> first is the lower pos
                p0, p1, s = min(pa, pb), max(pa, pb), va
            else:                 # mixed -> first is the + one... sign of
                # first pulse = s; second = -s because p1 < p0
                if va == 1:
                    p0, p1, s = pa, pb, 1
                else:
                    p0, p1, s = pb, pa, 1
                # mixed with s=+1 means p1 < p0
                assert p1 < p0, (t, idx, vals)
            tracks[t] = (p0, p1, s)
    return tracks


BASE = {t: (t, t, 1) for t in range(5)}


def diff_vs_base(tracks):
    """Which pulses moved vs the all-zero baseline. Returns list of
    (pulse_index 0..9, new_value 0..7). pulse t = first of track t,
    pulse t+5 = second."""
    moved = []
    for t in range(5):
        p0, p1, s = tracks[t]
        b = BASE[t]
        if (p0, p1, s) == b:
            continue
        v0, v1 = (p0 - t) // 5, (p1 - t) // 5
        if v0 != 0 and v1 == 0:
            moved.append((t, v0))
        elif v0 == 0 and v1 != 0:
            moved.append((t + 5, v1))
        elif v0 != 0 and v1 != 0:
            moved.append((t, v0))
            moved.append((t + 5, v1))
        else:  # both at track base but something changed (sign)
            moved.append((t, 0))
    return moved


def main():
    os.makedirs(os.path.join(HERE, "learned"), exist_ok=True)
    # ---- stage 1: single-bit probes, parallel over slots
    with ProcessPoolExecutor(max_workers=16) as ex:
        singles = list(ex.map(probe, [[s] for s in range(30)]))
    # per subframe: slot -> (pulse, value)
    owner = [dict() for _ in range(4)]
    for s, codes in enumerate(singles):
        for k in range(4):
            moved = diff_vs_base(decode_code(codes[k]))
            assert len(moved) == 1, (s, k, moved)
            owner[k][s] = moved[0]
    # consistency across subframes
    for k in range(1, 4):
        assert owner[k] == owner[0], (k, owner[k], owner[0])
    own = owner[0]
    print("slot -> (pulse, single-bit value):")
    for s in range(30):
        print(f"  slot {s:2d} (sf0 bit {POS_BITS[0][s]:3d}) -> pulse "
              f"{own[s][0]} value {own[s][1]}")
    # group slots by pulse
    fields = {}
    for s, (p, v) in own.items():
        fields.setdefault(p, []).append(s)
    assert sorted(fields) == list(range(10)), sorted(fields)
    assert all(len(v) == 3 for v in fields.values()), fields
    for p in fields:
        fields[p] = sorted(fields[p])

    # ---- stage 2: full 8-entry map per field
    jobs, keys = [], []
    for p, slots in fields.items():
        for combo in ((0, 1), (0, 2), (1, 2), (0, 1, 2)):
            jobs.append([slots[i] for i in combo])
            keys.append((p, combo))
    with ProcessPoolExecutor(max_workers=16) as ex:
        multi = list(ex.map(probe, jobs))
    # value map: bitmask over sorted slots -> track offset
    vmap = {p: {0: 0} for p in fields}
    for p, slots in fields.items():
        for i, s in enumerate(slots):
            vmap[p][1 << i] = own[s][1]
    for (p, combo), codes in zip(keys, multi):
        moved = diff_vs_base(decode_code(codes[0]))
        assert len(moved) == 1 and moved[0][0] == p, (p, combo, moved)
        mask = sum(1 << i for i in combo)
        vmap[p][mask] = moved[0][1]
        # cross-check sf1..3
        for k in range(1, 4):
            mk = diff_vs_base(decode_code(codes[k]))
            assert mk == moved, (p, combo, k, mk, moved)
    print("\nfield maps (mask over sorted slots -> position value):")
    for p in range(10):
        m = [vmap[p][x] for x in range(8)]
        print(f"  pulse {p} slots {fields[p]}: {m}")

    # ---- stage 3: sign rule checks on a split pair
    # move pulse 0 (track 0, first) to value 1 (position 5), set sign
    # bit 0: expect code[5] = -1 (first, sign -), code[0] = +1
    # (second at lower position => opposite of -)
    slot_p0 = fields[0]
    mask_for_v1 = [m for m in range(1, 8) if vmap[0][m] == 1]
    sel = mask_for_v1[0]
    slots = [slot_p0[i] for i in range(3) if sel >> i & 1]
    codes = probe(slots, sign_slots=(0,))
    q = codes[0]
    print("\nsign probe (pulse0 -> pos5, sign bit set): "
          f"code[0]={q[0]} code[5]={q[5]}")

    out = {
        "fields": {str(p): [POS_BITS[0][s] for s in fields[p]]
                   for p in range(10)},
        "slots": {str(p): fields[p] for p in range(10)},
        "vmap": {str(p): [vmap[p][x] for x in range(8)]
                 for p in range(10)},
        "sign_probe": {"code0": int(q[0]), "code5": int(q[5])},
    }
    with open(os.path.join(HERE, "learned", "posmap_mr122.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("\nwrote learned/posmap_mr122.json")


if __name__ == "__main__":
    main()
