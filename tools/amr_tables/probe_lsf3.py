"""LSF table recovery for the 3-index (non-MR122) AMR-NB modes, via
mode 7k95 probes (scalar gains: gp index 0 is exactly 0, so the
adaptive path, sharpening, and dispersion stay inactive in frame 1).

For each LSF group, decode frame-1 probes with a single group index set
and all other fields zero; fit (a, gc) per subframe sequentially with
the pinned low-mode chain (postfilter gammas 0.55/0.7, confirmed to
9.7e-7 residual); convert the SUBFRAME-4 fit to LSFs (interpolation
weight 1 there under every hypothesis). In frame 1 the LSF MA
predictor memory is zero, so measured(sf4) = mean_lsf_3 + row — row
DIFFERENCES vs index 0 are exact and identify each table in the lavc
binary by slide-matching (learned/lsf3_probe.npz -> scan in
pin_lsf3_tables.py).

Usage: python probe_lsf3.py [group] — group in {0,1,2}; runs ~12
probes and appends to the npz.
"""

from __future__ import annotations

import json
import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

OUT = os.path.join(HERE, "learned", "lsf3_probe.npz")

GROUP_FIELDS = ["lsf0", "lsf1", "lsf2"]
GROUP_BITS = [9, 9, 9]  # 7k95


def probe_values(nbits):
    vals = {0, 1, 2, 3, 4, 5, 8, 16, 32, 64, 128, 256}
    vals |= {(1 << nbits) - 1, (1 << (nbits - 1)) + 1}
    return sorted(v for v in vals if v < (1 << nbits))


_ctx = {}


def _init():
    from oracle import decode_bits
    import replica
    from fit_frame import HPG, HPP, a_to_lsf
    from scipy.optimize import least_squares

    om = json.load(open(os.path.join(HERE, "learned", "order_maps.json")))
    F5 = {(f["name"], f["subframe"]): f["bits"] for f in om["7k95"]}
    _ctx.update(decode_bits=decode_bits, replica=replica, HPG=HPG, HPP=HPP,
                a_to_lsf=a_to_lsf, ls=least_squares, F5=F5)


def make_frame(vals):
    b = [0] * 159
    for key, v in vals.items():
        bits = _ctx["F5"][key]
        for i, pos in enumerate(bits):
            b[pos] = (v >> (len(bits) - 1 - i)) & 1
    return b


CODE = None


def fit_frame_low(pcm160):
    """Sequential per-subframe (a, gc) fit, low-mode chain, 4-pulse
    all-zero code at positions (0,1,2,3)."""
    replica = _ctx["replica"]
    global CODE
    if CODE is None:
        CODE = np.zeros(40)
        CODE[[0, 1, 2, 3]] = 1.0
    st = replica.fresh_state()
    hp = [0.0] * 4
    HPG, HPP = _ctx["HPG"], _ctx["HPP"]
    scale = np.abs(pcm160).max()
    out_a, resids = [], []

    def clone(s):
        return {k: (v.copy() if hasattr(v, "copy") else v)
                for k, v in s.items()}

    for k in range(4):
        tgt = pcm160[40 * k:40 * (k + 1)]
        st_in, hp_in = clone(st), list(hp)

        def run(p, s, h):
            y = replica.subframe_chain(p[10] * CODE, p[:10], s, gn=0.55,
                                       gd=0.7, tilt_fac=0.8,
                                       tilt_clamp=False, agc_alpha=0.9)
            return replica.hp_biquad(
                y, np.array([1., -2., 1.]) * HPG, HPP, h)

        def resid(p):
            o, _ = run(p, clone(st_in), list(hp_in))
            return (o - tgt) / scale

        x0 = np.concatenate([out_a[-1] if out_a else np.zeros(10), [1e-4]])
        r = _ctx["ls"](resid, x0, xtol=3e-16, ftol=3e-16, max_nfev=600)
        out_a.append(r.x[:10])
        resids.append(float(np.abs(r.fun).max()))
        o, hp2 = run(r.x, st, hp)
        hp[:] = hp2
    return np.array(out_a), resids


def run_one(task):
    g, v = task
    if not _ctx:
        _init()
    pcm = _ctx["decode_bits"](5, [make_frame({(GROUP_FIELDS[g], -1): v})])
    try:
        a, resids = fit_frame_low(np.asarray(pcm[:160], float))
        lsf4 = _ctx["a_to_lsf"](a[3])
        return g, v, lsf4, max(resids)
    except Exception:  # degenerate root find: mark row unusable
        return g, v, np.full(10, np.nan), 1.0


def main():
    groups = [int(sys.argv[1])] if len(sys.argv) > 1 else [0, 1, 2]
    tasks = [(g, v) for g in groups for v in probe_values(GROUP_BITS[g])]
    res = {}
    if os.path.exists(OUT):
        z = np.load(OUT)
        res = {k: z[k] for k in z.files}
    with ProcessPoolExecutor(max_workers=8, initializer=_init) as ex:
        for g, v, lsf, resid in ex.map(run_one, tasks):
            print(f"g{g} v={v}: resid {resid:.2e} lsf {np.round(lsf, 1)}")
            res[f"g{g}_v{v}"] = lsf
            res[f"g{g}_v{v}_resid"] = np.array([resid])
    np.savez(OUT, **res)
    print("saved", OUT, len(res), "entries")


if __name__ == "__main__":
    main()
