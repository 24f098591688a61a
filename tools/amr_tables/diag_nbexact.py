"""Localize nbexact.py divergence vs lavc via AMRContext introspection.

Decodes the same random MR122 frames on lavc (reading the decoder state
after each frame at the offsets pinned in nbexact.py's docstring) and on
the Python replica (probe hooks), and reports the first stage whose
values differ. Offsets: pitch_vector@+0x6a0, fixed_vector@+0x740,
prediction_error@+0x7e0, pitch_gain[5]@+0x7f0, fixed_gain[5]@+0x804,
postfilter_mem@+0x828, lsf_q@+0x220, prev_lsp_sub4@+0x180.
"""
import ctypes as C
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import nbexact  # noqa: E402
import oracle  # noqa: E402

PRIV_OFF = 0x20


def rd(ptr, off, n, dt):
    buf = C.string_at(ptr + off, n * np.dtype(dt).itemsize)
    return np.frombuffer(buf, dt).copy()


def main(seed=0, nframes=4):
    rng = np.random.default_rng(seed)
    frames = [[int(b) for b in rng.integers(0, 2, 244)]
              for _ in range(nframes)]
    dec = oracle.Decoder("amrnb")
    priv = C.cast(C.c_void_p(dec.ctx + PRIV_OFF),
                  C.POINTER(C.c_void_p)).contents.value
    ours = nbexact.NBExact()
    for fi, bits in enumerate(frames):
        ref_pcm = dec.decode(oracle.pack_frame(7, bits))
        probes = []
        our_pcm = ours.frame(bits, probe=probes)
        st = dict(
            prev_lsp_sub4=rd(priv, 0x180, 10, np.float64),
            lsf_q=rd(priv, 0x220, 40, np.float32).reshape(4, 10),
            pitch_vector=rd(priv, 0x6a0, 40, np.float32),
            fixed_vector=rd(priv, 0x740, 40, np.float32),
            prediction_error=rd(priv, 0x7e0, 4, np.float32),
            pitch_gain=rd(priv, 0x7f0, 5, np.float32),
            fixed_gain=rd(priv, 0x804, 5, np.float32),
            postfilter_mem=rd(priv, 0x828, 10, np.float32),
        )
        last = probes[-1]
        def cmp(name, a, b):
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            n = min(len(a), len(b))
            ex = int((a[:n] == b[:n]).sum())
            mx = float(np.abs(a[:n] - b[:n]).max()) if n else 0.0
            print(f"  f{fi} {name:16s} exact {ex}/{n} maxabs {mx:.3e}")
        cmp("prev_lsp_sub4", ours.prev_lsp_sub4, st["prev_lsp_sub4"])
        cmp("pitch_vector", last["pv"], st["pitch_vector"])
        cmp("fixed_vector", last["fv"], st["fixed_vector"])
        cmp("pitch_gain", ours.pitch_gain, st["pitch_gain"])
        cmp("fixed_gain", ours.fixed_gain, st["fixed_gain"])
        cmp("pred_error", ours.prediction_error, st["prediction_error"])
        cmp("postfilter_mem", ours.postfilter_mem, st["postfilter_mem"])
        cmp("pcm", our_pcm, ref_pcm)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
