"""Pin the MR102 (10k2) fixed codebook from the sweep data
(probe_mr102.py -> learned/mr102_sweep.npz).

Established structure (this module extracts + validates it):

- 8 pulses, 2 per track, tracks k = positions {k, k+4, ..., k+36}
  (interleave 4, 10 positions per track).
- Innovation smoothing: CIRCULAR 40-sample convolution with the
  mr102 kernel (learned/mr102_kernel.npy, main tap 1, [1, -0.0348,
  0.099, -0.0217, 0.0301, ...]) applied synthesis-side.
- pulse4 (10 bits) jointly codes (track0 ordered pair, track1 pulse A);
  pulse5 (10 bits) codes (track2 ordered pair, track1 pulse B);
  pulse6 (7 bits) codes the track3 ordered pair. 1000*1000*100 = 100^4
  states exactly.
- Ordered-pair sign rule everywhere (MR122-style): sign bit k gives the
  FIRST pulse's sign on track k; the second pulse matches it when
  pos2 >= pos1 and flips otherwise. Track1's pair order is (A, B).
  Sign bit semantics: bit 0 -> +, 1 -> - (opposite to the other
  low modes' per-pulse convention).

Outputs learned/mr102_postables.json:
  T4: v -> [a0, a1, A]   (track0 ordered pair indices, track1 first)
  T5: v -> [c0, c1, B]   (track2 ordered pair, track1 second)
  T6: v -> [d0, d1]      (track3 ordered pair)
Validation: 40 random joint probes, full 8-pulse composite predicted
and matched exactly.
"""

from __future__ import annotations

import json
import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import amrnb_low as L  # noqa: E402
from modes_lab import LowChain, make_frame, MODE_IDX  # noqa: E402
from oracle import decode_bits  # noqa: E402
from probe_low_zero import frame1_a  # noqa: E402

KERNEL = np.load(os.path.join(HERE, "learned", "mr102_kernel.npy"))
KERNEL = KERNEL / KERNEL[0]
_HF = np.fft.fft(KERNEL)


def deconv(exc):
    return np.real(np.fft.ifft(np.fft.fft(np.asarray(exc)) / _HF))


_GMIN = int(np.argmin(L.GAINS_HIGH[:, 0]))
_CORR = L.GAINS_HIGH[_GMIN][1] / 2048.0
_EPRED = float(np.dot(L.PRED_MA, [L.ENER_INIT] * 4))
_S0 = _CORR * 10.0 ** (0.05 * (
    _EPRED + L.ENERGY_MEAN[L.MODE_IDX["10k2"]] - L.PRED_C))


def integer_pattern(q):
    """Integer pulse pattern from a deconvolved excitation. The pure
    shape fit has a scale ambiguity for uniform patterns (all-2 vs
    all-1); MR102 structure resolves it: every track carries exactly
    two unit pulses and the ordered-pair sign rule flips only across
    DISTINCT positions, so cancellation is impossible and the L1 norm
    of the pattern is always exactly 8."""
    q = np.asarray(q)
    best = None
    for m in (1, 2):                      # amplitude of the largest tap
        gc = np.abs(q).max() / m
        for _ in range(3):                # snap -> refine scale -> snap
            Pi = np.round(q / gc).astype(int)
            nrm = float(Pi @ Pi)
            if nrm == 0:
                break
            gc = float(q @ Pi) / nrm
        if nrm == 0 or int(np.abs(Pi).sum()) != 8:
            continue
        rel = float(np.linalg.norm(q - gc * Pi) / np.linalg.norm(q))
        if best is None or rel < best[0]:
            best = (rel, Pi)
    assert best is not None and best[0] < 0.10, ("no integer fit", best)
    return best[1]


def ordered_pair(ps, t):
    """[(pos, amp)] on track t (sum |amp| = 2, first-pulse sign +) ->
    ordered (a_first, a_second)."""
    if len(ps) == 1:
        p, a = ps[0]
        assert abs(a) == 2
        return ((p - t) // 4, (p - t) // 4)
    (p1, a1), (p2, a2) = sorted(ps)
    if a1 > 0 and a2 > 0:
        return ((p1 - t) // 4, (p2 - t) // 4)
    if a1 < 0:   # lower position is the (flipped) second pulse
        return ((p2 - t) // 4, (p1 - t) // 4)
    raise AssertionError(ps)


def extract_tables():
    z = np.load(os.path.join(HERE, "learned", "mr102_sweep.npz"))
    keys = list(z["keys"])
    exc = z["exc"]
    K = {k: i for i, k in enumerate(keys)}
    T4, T5, T6 = {}, {}, {}
    for v in range(1024):
        P = integer_pattern(deconv(exc[K[f"pulse4|{v}"]]))
        t0 = [(p, int(P[p])) for p in np.where(P != 0)[0] if p % 4 == 0]
        t1 = dict((int(p), int(P[p]))
                  for p in np.where(P != 0)[0] if p % 4 == 1)
        pair0 = ordered_pair(t0, 0)
        # track1 = A(first) + B_base(idx 0 at pos 1, second)
        if t1 == {1: 2}:
            A = 0
        else:
            assert t1.get(1) == -1 and len(t1) == 2, (v, t1)
            (pA,) = [p for p in t1 if p != 1]
            assert t1[pA] == 1
            A = (pA - 1) // 4
        T4[v] = (pair0[0], pair0[1], A)

        P = integer_pattern(deconv(exc[K[f"pulse5|{v}"]]))
        t2 = [(p, int(P[p])) for p in np.where(P != 0)[0] if p % 4 == 2]
        t1 = dict((int(p), int(P[p]))
                  for p in np.where(P != 0)[0] if p % 4 == 1)
        pair2 = ordered_pair(t2, 2)
        # track1 = A_base(idx 0 at pos 1, first) + B(second): both + when
        # B >= 0 (always), so {1:+1, pos:+1} or {1:+2}
        if t1 == {1: 2}:
            B = 0
        else:
            assert t1.get(1) == 1 and len(t1) == 2, (v, t1)
            (pB,) = [p for p in t1 if p != 1]
            assert t1[pB] == 1
            B = (pB - 1) // 4
        T5[v] = (pair2[0], pair2[1], B)
    for v in range(128):
        P = integer_pattern(deconv(exc[K[f"pulse6|{v}"]]))
        t3 = [(p, int(P[p])) for p in np.where(P != 0)[0] if p % 4 == 3]
        T6[v] = ordered_pair(t3, 3)
    return T4, T5, T6


def compose(T4, T5, T6, p4, p5, p6, signs):
    """Predicted 40-sample integer pattern for the field values."""
    a0, a1, A = T4[p4]
    c0, c1, B = T5[p5]
    d0, d1 = T6[p6]
    P = np.zeros(40)

    def sgn(bit):
        return 1.0 if ((signs >> bit) & 1) == 0 else -1.0

    def add_pair(track, first, second, s):
        p1, p2 = track + 4 * first, track + 4 * second
        P[p1] += s
        P[p2] += s if p2 >= p1 else -s

    add_pair(0, a0, a1, sgn(0))
    add_pair(1, A, B, sgn(1))
    add_pair(2, c0, c1, sgn(2))
    add_pair(3, d0, d1, sgn(3))
    return P


def _probe(args):
    p4, p5, p6, signs = args
    F = L.fields("10k2")
    g = int(np.argmin(L.GAINS_HIGH[:, 0]))
    vals = {}
    for (name, sf), bits in F.items():
        if name == "p_lag":
            vals[(name, sf)] = (1 << len(bits)) - 1
        elif name == "p_gain":
            vals[(name, sf)] = g
    vals[("pulse4", 0)] = p4
    vals[("pulse5", 0)] = p5
    vals[("pulse6", 0)] = p6
    for k in range(4):
        vals[(f"pulse{k}", 0)] = (signs >> k) & 1
    pcm = decode_bits(MODE_IDX["10k2"], [make_frame("10k2", vals)])
    ch = LowChain()
    a = frame1_a("10k2", 0)
    exc, _ = ch.fit_exc(a, pcm[0:40])
    return integer_pattern(deconv(exc))


def main():
    T4, T5, T6 = extract_tables()
    print("T4 combos:", len(set(T4.values())),
          "T5:", len(set(T5.values())), "T6:", len(set(T6.values())))
    rng = np.random.default_rng(7)
    jobs = [(int(rng.integers(1024)), int(rng.integers(1024)),
             int(rng.integers(128)), int(rng.integers(16)))
            for _ in range(40)]
    with ProcessPoolExecutor(max_workers=16) as ex:
        outs = list(ex.map(_probe, jobs))
    bad = 0
    for (p4, p5, p6, s), got in zip(jobs, outs):
        exp = compose(T4, T5, T6, p4, p5, p6, s)
        if not np.array_equal(exp, got):
            bad += 1
            print("MISMATCH", p4, p5, p6, s)
            print("  exp", {i: int(exp[i]) for i in np.where(exp)[0]})
            print("  got", {i: int(got[i]) for i in np.where(got)[0]})
    print(f"validation: {len(jobs) - bad}/{len(jobs)} exact")
    assert bad == 0
    json.dump(dict(
        T4={str(v): [int(x) for x in T4[v]] for v in T4},
        T5={str(v): [int(x) for x in T5[v]] for v in T5},
        T6={str(v): [int(x) for x in T6[v]] for v in T6},
    ), open(os.path.join(HERE, "learned", "mr102_postables.json"), "w"))
    print("saved learned/mr102_postables.json")


if __name__ == "__main__":
    main()
