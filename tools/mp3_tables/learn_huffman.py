"""Learn ISO Layer III Huffman tables by black-box probing libmpg123 (v3).

DFS over candidate bit prefixes with a dual-marker parse-boundary oracle
(verified count1-B codes landing on coeffs 2/3).  Classification per
aligned hit (k = appended zeros, (x,y) = decoded pair):
  negative or >15 value        -> inside a code's sign/linbits: prune
  no 15, k == signs            -> TRUE codeword: record, prune children
  no 15, k <  signs            -> code + partial extras: prune
  no 15, k >  signs            -> zero-run ancestor of a code: expand both
  15 present                   -> candidate (resolve with linbits later);
                                  k==0: prune (fully consumed), else expand
Non-aligned nodes are internal (Huffman trees are full): expand.
Resolution picks candidates with k == signs + linbits*(#15s); table-level
validation: prefix-free, Kraft sum == 1, full (xlen x ylen) coverage.
"""
import os
import sys
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from packer import probe_stream_mpeg1
from oracle import mpg123_decode

import os
_HERE = os.path.dirname(os.path.abspath(__file__))

SR, KBPS, GG = 32000, 64, 210


def decode(bits, big_values=1, table=1):
    gr = {"part2_3_length": len(bits), "big_values": big_values,
          "global_gain": GG, "table_select": [table, table, table],
          "count1table_select": 1, "maindata": bits}
    return mpg123_decode(probe_stream_mpeg1(SR, KBPS, gr))[0]


class Bases:
    def __init__(self):
        raw = [decode("0111" + "0", 0, 0), decode("1011" + "0", 0, 0),
               decode("1101" + "0", 0, 0), decode("1110" + "0", 0, 0)]
        n = min(len(b) for b in raw)
        B = np.stack([x[:n].astype(np.float64) for x in raw], axis=1)
        self.n = n
        self.proj = np.linalg.pinv(B)

    def project(self, pcm):
        v = np.asarray(pcm[:self.n], np.float64)
        if len(v) < self.n:
            v = np.pad(v, (0, self.n - len(v)))
        return self.proj @ v


def val(a):
    return int(round(abs(a) ** 0.75)) * (1 if a >= 0 else -1)


MARK1, MARK2 = "01110", "10110"


def aligned(bases, table, p, k):
    a1 = bases.project(decode(p + "0" * k + MARK1, 1, table))
    if not (abs(a1[2] - 1.0) < 0.25 and abs(a1[3]) < 0.25):
        return None
    a2 = bases.project(decode(p + "0" * k + MARK2, 1, table))
    if not (abs(a2[3] - 1.0) < 0.25 and abs(a2[2]) < 0.25):
        return None
    if abs(a1[0] - a2[0]) > 0.3 * max(1, abs(a1[0])) or \
       abs(a1[1] - a2[1]) > 0.3 * max(1, abs(a1[1])):
        return None
    return val(a1[0]), val(a1[1])


def learn_table(tno, bases, kmax, maxlen=24):
    cands = []
    stack = ["1", "0"]
    probes = 0
    while stack:
        p = stack.pop()
        if len(p) > maxlen:
            raise RuntimeError(f"table {tno}: prefix beyond maxlen: {p}")
        hit = None
        for k in range(kmax + 1):
            probes += 1
            xy = aligned(bases, tno, p, k)
            if xy is not None:
                hit = (k, xy)
                break
        if hit is None:
            stack.append(p + "0")
            stack.append(p + "1")
            continue
        k, (x, y) = hit
        if x < 0 or y < 0 or x > 15 or y > 15:
            continue  # inside another code's extras
        s = (1 if x else 0) + (1 if y else 0)
        if x == 15 or y == 15:
            cands.append((p, k, x, y))
            if k > 0:
                stack.append(p + "0")
                stack.append(p + "1")
            continue
        if k == s:
            cands.append((p, k, x, y))
        elif k > s:
            stack.append(p + "0")
            stack.append(p + "1")
        # k < s: prune
    return cands, probes


def resolve(cands, linbits):
    out = {}
    for p, k, x, y in cands:
        exp = (1 if x else 0) + (1 if y else 0) + \
            linbits * ((1 if x == 15 else 0) + (1 if y == 15 else 0))
        if k == exp:
            out[p] = (x, y)
    return out


def check_table(leaves):
    codes = sorted(leaves, key=len)
    for i, a in enumerate(codes):
        for b in codes[i + 1:]:
            if b.startswith(a):
                return False, f"not prefix-free: {a} < {b}"
    kraft = sum(2.0 ** -len(p) for p in leaves)
    if abs(kraft - 1.0) > 1e-9:
        return False, f"kraft {kraft:.6f}"
    xs = {x for x, _ in leaves.values()}
    ys = {y for _, y in leaves.values()}
    xlen, ylen = max(xs) + 1, max(ys) + 1
    want = {(x, y) for x in range(xlen) for y in range(ylen)}
    got = set(leaves.values())
    if got != want:
        return False, f"coverage: missing {sorted(want-got)[:4]}"
    if len(leaves) != xlen * ylen:
        return False, "duplicate pairs"
    return True, (xlen, ylen)


def learn_one(tno):
    bases = Bases()
    cands, probes = learn_table(tno, bases, kmax=4)
    if any(x == 15 or y == 15 for _, _, x, y in cands):
        cands, probes2 = learn_table(tno, bases, kmax=30)
        probes += probes2
    for L in range(14):
        leaves = resolve(cands, L)
        if not leaves:
            continue
        ok, info = check_table(leaves)
        if ok:
            return {"table": tno, "linbits": L, "xlen": info[0],
                    "ylen": info[1], "probes": probes,
                    "codes": {f"{x},{y}": p for p, (x, y) in leaves.items()}}
    raise RuntimeError(f"table {tno}: unresolved ({len(cands)} candidates)")


def main():
    import json, time, multiprocessing as mp
    tnos = [int(a) for a in sys.argv[1:]]
    if not tnos:
        tnos = [1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15] + \
            list(range(16, 32))
    t0 = time.time()
    import os
    out = {}
    if os.path.exists(_HERE + "/learned/tables.json"):
        out = json.load(open(_HERE + "/learned/tables.json"))
    tnos = [t for t in tnos if str(t) not in out]
    with mp.Pool(min(max(len(tnos),1), 14)) as pool:
        for r in pool.imap_unordered(learn_one, tnos):
            out[str(r["table"])] = r
            json.dump(out, open(_HERE + "/learned/tables.json", "w"), indent=0)
            print(f"table {r['table']}: {r['xlen']}x{r['ylen']} linbits "
                  f"{r['linbits']} maxcode "
                  f"{max(len(c) for c in r['codes'].values())} "
                  f"({r['probes']} probes) {time.time()-t0:.0f}s", flush=True)
    print(f"total {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
