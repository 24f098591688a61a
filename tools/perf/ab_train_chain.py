"""A/B the fused-chain custom VJP (ops/res2_chain_vjp.py) on the
flagship train step (real TPU), on top of the production fused
pool+BN configuration.

Usage:  python tools/perf/ab_train_chain.py [--reps 6] [--inner 4]

Methodology per .claude/skills/verify/SKILL.md: one program per tight
loop, best-of-N reps.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--inner", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from asvspoof2021_air_tpu.models import ECAPA_TDNN
    from asvspoof2021_air_tpu.train.steps import (
        StepConfig,
        make_multi_step,
        make_train_step,
    )

    on_tpu, lfcc, _model, ocs, rng, wave, labels = bench._flagship()
    B, K = bench.B, 8
    results = {}
    for chain in (False, True):
        model = ECAPA_TDNN(C=512, model_scale=8, n_out=2, n_feat=60,
                           dtype=jnp.bfloat16 if on_tpu else None,
                           fused_pool=on_tpu, fused_bn=on_tpu,
                           fused_chain=chain)
        state, btx, ltx = bench._train_state(rng, model, lfcc, wave,
                                             labels, ocs)
        step_fn = make_train_step(
            model, ocs, btx, ltx, StepConfig(add_loss="ang_iso"),
            frontend=lambda b, k, p=None: lfcc(b["wave"]),
        )
        multi = jax.jit(make_multi_step(step_fn, K), donate_argnums=(0,))
        batches = {
            "wave": jnp.broadcast_to(wave, (K, B, bench.WAVE_LEN)),
            "label": jnp.broadcast_to(labels, (K, B)),
        }
        t0 = time.perf_counter()
        state, m = multi(state, batches, jax.random.PRNGKey(1), 0.0)
        jax.block_until_ready(m["total_loss"])
        compile_s = time.perf_counter() - t0
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            s = state
            for _ in range(args.inner):
                s, m = multi(s, batches, jax.random.PRNGKey(1), 0.0)
            jax.block_until_ready(m["total_loss"])
            state = s
            dt = (time.perf_counter() - t0) / (args.inner * K)
            best = dt if best is None else min(best, dt)
        key = f"chain={int(chain)}"
        results[key] = {"ms_per_step": round(best * 1000, 3),
                        "utt_s": round(B / best, 1),
                        "compile_s": round(compile_s, 1)}
        print(json.dumps({key: results[key]}), flush=True)

    winner = min(results, key=lambda k: results[k]["ms_per_step"])
    print(json.dumps({"winner": winner, **results[winner]}))


if __name__ == "__main__":
    main()
