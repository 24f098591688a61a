"""A/B: overlap-save block FFTs vs the single (64, 131072) rfft/irfft
pair in the channel augmenter (real TPU).

Round-3 verdict item 7: the augmenter's big FFT pair costs 4.8 of the
~7.5 ms augmentation budget, and the overlap-save lever was parked on an
unmeasured "~1 ms" estimate. This measures it: the exact augmenter
convolution (B=64, L=120000 input, per-utterance kernels of klen=1024 —
the 128-tap family FIR combined with a 512-tap IR, padded to the small-
FFT size) computed (a) with the production single pair at n_fft=131072
and (b) with 50%-overlap overlap-save blocks at N in {4096..32768},
built from two reshape views (no gathers). Numerical equality is checked
against the baseline before timing.

Flop arithmetic says blocked FFTs LOSE here (the 131072 transform is
only 5.6% padded above L+klen, while 50% overlap doubles the samples
transformed); the open question was whether VMEM-resident small FFTs
beat the HBM-streaming big one anyway. Run on the real chip to decide.

Usage: python tools/perf/ab_overlap_save.py [--reps 5] [--inner 10]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--inner", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    B, L, KLEN, NBIG = 64, 120000, 1024, 131072
    g = np.random.default_rng(0)
    waves = jnp.asarray(g.standard_normal((B, L)), jnp.float32)
    kernel = jnp.asarray(
        g.standard_normal((B, KLEN)) * np.exp(-np.arange(KLEN) / 64.0),
        jnp.float32)

    def big_pair(x, k):
        H = jnp.fft.rfft(k, n=NBIG, axis=-1)
        X = jnp.fft.rfft(x, n=NBIG, axis=-1)
        return jnp.fft.irfft(X * H, n=NBIG, axis=-1)[:, :L + KLEN - 1]

    def overlap_save(N):
        Hh = N // 2
        assert KLEN - 1 <= Hh
        nb = math.ceil((L + KLEN - 1) / Hh)

        def f(x, k):
            xp = jnp.pad(x, ((0, 0), (Hh, (nb + 1) * Hh - Hh - L)))
            r = xp.reshape(B, nb + 1, Hh)
            blocks = jnp.concatenate([r[:, :-1], r[:, 1:]], axis=-1)
            Hk = jnp.fft.rfft(k, n=N, axis=-1)[:, None, :]
            Y = jnp.fft.irfft(jnp.fft.rfft(blocks, axis=-1) * Hk,
                              n=N, axis=-1)
            y = Y[:, :, Hh:].reshape(B, nb * Hh)
            return y[:, :L + KLEN - 1]

        return f

    def bench(fn):
        # chain each call on the previous output (adding it to the input)
        # so the relay cannot ack a burst without running the device work
        # (SKILL.md "relay can ack a burst of dispatches" glitch), and
        # read one element back per repetition.
        jf = jax.jit(lambda x, k: fn(x, k)[:, :L])
        out = jf(waves, kernel)
        out.block_until_ready()
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            x = waves
            for _ in range(args.inner):
                x = jf(x, kernel)
            _ = float(x[0, 0])
            best = min(best, (time.perf_counter() - t0) / args.inner)
        return best * 1e3, fn(waves, kernel)

    base_ms, base_out = bench(big_pair)
    results = {"big_pair_131072_ms": round(base_ms, 3)}
    print(f"big pair n=131072: {base_ms:.3f} ms")
    for N in (4096, 8192, 16384, 32768):
        ms, out = bench(overlap_save(N))
        err = float(jnp.abs(out - base_out).max())
        results[f"overlap_save_{N}_ms"] = round(ms, 3)
        results[f"overlap_save_{N}_maxerr"] = err
        print(f"overlap-save N={N:6d}: {ms:.3f} ms  maxerr {err:.2e}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
