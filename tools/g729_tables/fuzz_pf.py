"""Fuzz pf_exact (the Python port) against the REAL ff_g729_postfilter /
ff_g729_adaptive_gain_control object code via the pf_probe fork server."""

from __future__ import annotations

import struct
import subprocess
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools/g729_tables")
import pf_exact as pe  # noqa: E402

PROBE = "/tmp/wbdis/pf_probe"
RESBUF, RFD, PFD = 320, 64, 64


class Probe:
    def __init__(self):
        self.p = subprocess.Popen([PROBE, "64"], stdin=subprocess.PIPE,
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.DEVNULL)

    def pf(self, pdi, voic, htp, lp, res, rfd, pfd, sp):
        msg = (b"P" + struct.pack("<iih", pdi, voic, htp)
               + b"".join(np.asarray(a, np.int16).tobytes()
                          for a in [lp, res, rfd, pfd, sp]))
        self.p.stdin.write(msg)
        self.p.stdin.flush()
        r = self.p.stdout.read(982)
        assert len(r) == 982
        if r[:1] == b"\x7e" and r[1:2] == b"\x7e":
            return None
        voicing, htpo = struct.unpack("<ih", r[:6])
        o = 6
        out = {"voicing": voicing, "htp": htpo}
        for name, n in [("res", RESBUF), ("rfd", RFD), ("pfd", PFD),
                        ("sp", 40)]:
            out[name] = np.frombuffer(r[o:o + 2 * n], np.int16).copy()
            o += 2 * n
        return out

    def agc(self, gb, ga, gp, sp):
        msg = (b"A" + struct.pack("<iih", gb, ga, gp)
               + np.asarray(sp, np.int16).tobytes())
        self.p.stdin.write(msg)
        self.p.stdin.flush()
        r = self.p.stdout.read(82)
        assert len(r) == 82
        g, = struct.unpack("<h", r[:2])
        return g, np.frombuffer(r[2:], np.int16).copy()


def fuzz_pf(n=200, seed=0, loud=False):
    pr = Probe()
    rng = np.random.default_rng(seed)
    bad = 0
    for t in range(n):
        scale = int(rng.choice([30, 300, 3000, 20000]))
        lp = np.zeros(11, np.int64)
        lp[0] = 4096
        lp[1:] = rng.integers(-2500, 2500, 10)
        res = rng.integers(-scale, scale, RESBUF).astype(np.int64)
        rfd = rng.integers(-scale, scale, RFD).astype(np.int64)
        pfd = rng.integers(-scale, scale, PFD).astype(np.int64)
        sp = rng.integers(-scale, scale, 40).astype(np.int64)
        pdi = int(rng.integers(20, 144))
        voic = int(rng.integers(0, 2))
        htp = int(rng.integers(-32768, 32768))
        # sometimes plant periodicity so the long-term filter engages
        if rng.random() < 0.7:
            base = rng.integers(-scale, scale, RESBUF + 160)
            for i in range(RESBUF):
                res[i] = base[i] + base[i + pdi] // 2
        ref = pr.pf(pdi, voic, htp, lp.copy(), res.copy(), rfd.copy(),
                    pfd.copy(), sp.copy())
        if ref is None:
            continue
        # run the port; probe passes lp as the 10 coeffs at lp[1..10]
        myres = res.copy()
        myrfd = list(rfd[:10])
        mypfd = list(pfd[:50])
        mysp = list(sp)
        v2, h2 = pe.postfilter(pdi, voic, htp, lp, myres, myrfd, mypfd,
                               mysp)
        ok = (v2 == ref["voicing"] and h2 == ref["htp"]
              and np.array_equal(np.asarray(mysp, np.int16), ref["sp"])
              and np.array_equal(np.asarray(myres[:192], np.int16),
                                 ref["res"][:192])
              and np.array_equal(np.asarray(myrfd, np.int16),
                                 ref["rfd"][:10])
              and np.array_equal(np.asarray(mypfd, np.int16),
                                 ref["pfd"][:50]))
        if not ok:
            bad += 1
            if loud and bad <= 3:
                print(f"--- trial {t} pdi={pdi} scale={scale} "
                      f"voic {v2}/{ref['voicing']} htp {h2}/{ref['htp']}")
                m = np.asarray(mysp, np.int16)
                d = np.nonzero(m != ref["sp"])[0]
                print("  sp diff idx", d[:8], "mine", m[d[:4]],
                      "ref", ref["sp"][d[:4]])
                dr = np.nonzero(np.asarray(myres[:192], np.int16)
                                != ref["res"][:192])[0]
                print("  res diff idx", dr[:8])
                dp = np.nonzero(np.asarray(mypfd, np.int16)
                                != ref["pfd"][:50])[0]
                print("  pfd diff idx", dp[:8])
    print(f"postfilter: {n - bad}/{n} exact")
    return bad


def fuzz_agc(n=300, seed=1):
    pr = Probe()
    rng = np.random.default_rng(seed)
    bad = 0
    for t in range(n):
        gb = int(rng.choice([0, 1, 5, 100, 5000, 400000, 1310720]))
        ga = int(rng.choice([0, 1, 7, 120, 4800, 390000, 1310000]))
        gp = int(rng.integers(-32768, 32768))
        sp = rng.integers(-32768, 32767, 40).astype(np.int64)
        g_ref, sp_ref = pr.agc(gb, ga, gp, sp.copy())
        mysp = list(sp)
        g2 = pe.adaptive_gain_control(gb, ga, mysp, gp)
        if gb != 0 and ga == 0:
            mysp = list(sp)  # untouched path
        ok = (g2 == g_ref
              and np.array_equal(np.asarray(mysp, np.int16), sp_ref))
        if not ok:
            bad += 1
            if bad <= 3:
                print(f"agc trial {t}: gb={gb} ga={ga} gp={gp} "
                      f"g {g2}/{g_ref}")
                m = np.asarray(mysp, np.int16)
                d = np.nonzero(m != sp_ref)[0]
                print("  sp diff", d[:6], m[d[:3]], sp_ref[d[:3]])
    print(f"agc: {n - bad}/{n} exact")
    return bad


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    if what in ("pf", "both"):
        fuzz_pf(n, loud=True)
    if what in ("agc", "both"):
        fuzz_agc()
