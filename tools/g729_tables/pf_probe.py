"""Direct probe of lavc's exact fixed-point G.729 postfilter.

Rebuilt server: probe_main2.c (fork-isolated per request; ops: P=postfilter,
A=agc, L=lsp2lpc, D=lp_decode, S=synthesis, R=reorder_lsf, F=lsf2lsp,
G=log2_q15).  libavcodec.so hides ``ff_g729_postfilter`` / ``ff_g729_adaptive_gain_control``
(no dynamic symbols), but the static archive ``libavcodec.a`` in the image
carries ``g729postfilter.o``; probe_main2.c (copy banked in this directory) links that object (plus
the celp/acelp helpers it references) into a tiny stdin/stdout server so the
EXACT integer postfilter can be unit-probed function-by-function.  This is the
ground truth the exact port in truedec729.py / native/augment/g729.cc is
fuzzed against (reference behavioral target:
/root/reference/channel_simulation/simulated_channel.py:36-39 `g729a`).

Rebuild if needed:
  cd /tmp/wbdis && ar x /usr/lib/x86_64-linux-gnu/libavcodec.a \
      g729postfilter.o acelp_filters.o acelp_vectors.o celp_filters.o \
      celp_math.o lsp.o acelp_pitch_delay.o
  gcc -no-pie -O1 -o pf_probe probe_main2.c g729postfilter.o acelp_filters.o \
      acelp_vectors.o celp_filters.o celp_math.o lsp.o -lm
"""

from __future__ import annotations

import struct
import subprocess

import numpy as np

PROBE = "/tmp/wbdis/pf_probe"
SUBFRAME = 40
RESBUF = 320
RFD = 64
PFD = 64


class PF:
    def __init__(self):
        self.p = subprocess.Popen([PROBE], stdin=subprocess.PIPE,
                                  stdout=subprocess.PIPE)

    def _rd(self, n):
        b = self.p.stdout.read(n)
        assert len(b) == n, "probe died"
        return b

    def postfilter(self, pitch_delay_int, voicing, ht_prev, lp, residual,
                   res_filter_data, pos_filter_data, speech):
        """Run ff_g729_postfilter; returns dict of all outputs."""
        lp11 = np.zeros(11, np.int16)   # [0] unused; function reads [1..10]
        lp = np.asarray(lp, np.int16)
        lp11[11 - len(lp):] = lp[-min(len(lp), 10):] if len(lp) <= 11 else lp[1:]
        if len(lp) == 11:
            lp11[:] = lp
        res = np.zeros(RESBUF, np.int16); res[:len(residual)] = residual
        rfd = np.zeros(RFD, np.int16); rfd[:len(res_filter_data)] = res_filter_data
        pfd = np.zeros(PFD, np.int16); pfd[:len(pos_filter_data)] = pos_filter_data
        sp = np.asarray(speech, np.int16)
        lp = lp11
        assert sp.size == SUBFRAME
        msg = (b"P" + struct.pack("<iih", pitch_delay_int, voicing, ht_prev)
               + lp.tobytes() + res.tobytes() + rfd.tobytes() + pfd.tobytes()
               + sp.tobytes())
        self.p.stdin.write(msg); self.p.stdin.flush()
        voicing_o, htp_o = struct.unpack("<ih", self._rd(6))
        out = {}
        out["voicing"] = voicing_o
        out["ht_prev"] = htp_o
        out["residual"] = np.frombuffer(self._rd(RESBUF * 2), np.int16).copy()
        out["res_filter_data"] = np.frombuffer(self._rd(RFD * 2), np.int16).copy()
        out["pos_filter_data"] = np.frombuffer(self._rd(PFD * 2), np.int16).copy()
        out["speech"] = np.frombuffer(self._rd(SUBFRAME * 2), np.int16).copy()
        return out

    def agc(self, gain_before, gain_after, gain_prev, speech):
        sp = np.asarray(speech, np.int16)
        assert sp.size == SUBFRAME
        msg = (b"A" + struct.pack("<iih", gain_before, gain_after, gain_prev)
               + sp.tobytes())
        self.p.stdin.write(msg); self.p.stdin.flush()
        g, = struct.unpack("<h", self._rd(2))
        out_sp = np.frombuffer(self._rd(SUBFRAME * 2), np.int16).copy()
        return g, out_sp

    def close(self):
        self.p.stdin.close(); self.p.wait()


if __name__ == "__main__":
    pf = PF()
    # smoke: zero everything
    o = pf.postfilter(40, 0, 0, [0] * 10, np.zeros(RESBUF, np.int16),
                      np.zeros(RFD, np.int16), np.zeros(PFD, np.int16),
                      np.zeros(SUBFRAME, np.int16))
    print("zero speech out:", o["speech"][:8], "voicing", o["voicing"])
    g, s = pf.agc(100, 100, 0, np.full(SUBFRAME, 1000, np.int16))
    print("agc gain:", g, "speech[:4]:", s[:4])
    rng = np.random.default_rng(0)
    sp = rng.integers(-2000, 2000, SUBFRAME).astype(np.int16)
    lp = (np.array([-1.6, 0.9] + [0] * 8) * 4096).astype(np.int16)
    o = pf.postfilter(50, 1, 0, lp, rng.integers(-300, 300, RESBUF).astype(np.int16),
                      np.zeros(RFD, np.int16), np.zeros(PFD, np.int16), sp)
    print("rand speech out:", o["speech"][:8], "voicing", o["voicing"],
          "htp", o["ht_prev"])
    # which residual entries changed? (locates RES_PREV_DATA_SIZE & memmove)
    pf.close()
