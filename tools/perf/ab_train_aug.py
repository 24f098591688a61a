"""A/B the fused training kernels UNDER THE AUGMENTED FRONT-END (real TPU).

Round-2 driver captures showed augmented train regressing 2160.7 ->
1927.0 utt/s/chip while clean train improved (VERDICT r2 "What's weak"
#1). The suspected interaction is the fused_pool/fused_bn kernels
(enabled in bench.stage_train_aug since round 2) composing badly with the
on-device augmentation front-end. This measures the four combinations on
exactly bench.stage_train_aug's configuration (B=64, OnDeviceFrontend
with IR bank + Pallas LFCC, ECAPA-512 bf16, ang_iso, K=8 scan).

Usage:  python tools/perf/ab_train_aug.py [--reps 6] [--inner 4]

Methodology per .claude/skills/verify/SKILL.md: one combination per
process would be ideal; we at least run each combination's tight loop
back-to-back best-of-N and report all four so a relay glitch shows as an
implausible outlier rather than a silent headline.
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--inner", type=int, default=4)
    ap.add_argument("--combos", default="all",
                    help="comma list like 'pool=0,bn=0;pool=1,bn=1'")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from asvspoof2021_air_tpu.models import ECAPA_TDNN
    from asvspoof2021_air_tpu.ops.augment import (
        ChannelAugmenter,
        synthetic_ir_bank,
    )
    from asvspoof2021_air_tpu.train.frontend import OnDeviceFrontend
    from asvspoof2021_air_tpu.train.steps import (
        StepConfig,
        make_multi_step,
        make_train_step,
    )

    on_tpu, lfcc, _model, ocs, rng, wave, labels = bench._flagship()
    B, K = bench.B, 8
    fe = OnDeviceFrontend(
        feat_len=750, padding="repeat",
        augmenter=ChannelAugmenter(ir_bank=synthetic_ir_bank()),
        apply_ir=True, use_pallas=on_tpu,
    )
    aug_wave_len = fe.min_samples()
    results = {}
    combos = list(itertools.product((False, True), repeat=2))
    if args.combos != "all":
        want = set(args.combos.split(";"))
        combos = [(p, b) for p, b in combos
                  if f"pool={int(p)},bn={int(b)}" in want]
    for pool, bn in combos:
        model = ECAPA_TDNN(C=512, model_scale=8, n_out=2, n_feat=60,
                           dtype=jnp.bfloat16 if on_tpu else None,
                           fused_pool=pool and on_tpu,
                           pool_interpret=pool and not on_tpu,
                           fused_bn=bn)
        state, btx, ltx = bench._train_state(rng, model, lfcc, wave,
                                             labels, ocs)
        step_fn = make_train_step(model, ocs, btx, ltx,
                                  StepConfig(add_loss="ang_iso"),
                                  frontend=fe)
        multi = jax.jit(make_multi_step(step_fn, K), donate_argnums=(0,))
        batches = {
            "wave": jnp.broadcast_to(
                wave[:, :aug_wave_len], (K, B, aug_wave_len)),
            "length": jnp.full((K, B), aug_wave_len, jnp.int32),
            "label": jnp.broadcast_to(labels, (K, B)),
        }
        t0 = time.perf_counter()
        state, m = multi(state, batches, jax.random.PRNGKey(1), 0.0,
                         fe.params)
        jax.block_until_ready(m["total_loss"])
        compile_s = time.perf_counter() - t0
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            s = state
            for _ in range(args.inner):
                s, m = multi(s, batches, jax.random.PRNGKey(1), 0.0,
                             fe.params)
            jax.block_until_ready(m["total_loss"])
            state = s
            dt = (time.perf_counter() - t0) / (args.inner * K)
            best = dt if best is None else min(best, dt)
        key = f"pool={int(pool)},bn={int(bn)}"
        results[key] = {"ms_per_step": round(best * 1000, 3),
                        "utt_s": round(B / best, 1),
                        "compile_s": round(compile_s, 1)}
        print(json.dumps({key: results[key]}), flush=True)

    if len(results) > 1:
        winner = min(results, key=lambda k: results[k]["ms_per_step"])
        print(json.dumps({"winner": winner, **results[winner]}))


if __name__ == "__main__":
    main()
