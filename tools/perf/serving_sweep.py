"""Sweep the fused serving graph over (batch size, quantize tier).

The round-1 batch-scaling measurement (docs/PERFORMANCE.md) found
throughput flat in B from 64 up — but it predates the fused-chain /
fused-pool / lane-aligned-LFCC kernels, whose per-batch fixed costs
(Pallas grid setup, scan step overhead) shrink relative to useful work
as B grows. This re-measures the scanned serving point at several batch
sizes and tiers on the real chip.

Usage (on the TPU):
    python tools/perf/serving_sweep.py [--b 64 128] [--tiers bf16 mfa int8]

Prints one JSON line per (B, tier) with ms/batch and utt/s/chip.
Timing uses the same plausibility re-measure guard as bench.py.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

WAVE_LEN = 119840  # 750 LFCC frames at 16 kHz, the flagship shape


def measure_point(B: int, tier: str, scan_k: int = 8, n_iter: int = 6):
    import jax
    import jax.numpy as jnp

    from asvspoof2021_air_tpu.losses import build_loss
    from asvspoof2021_air_tpu.models import ECAPA_TDNN
    from asvspoof2021_air_tpu.ops.lfcc_pallas import PallasLFCC
    from asvspoof2021_air_tpu.serving.ecapa_int8 import ecapa_apply_int8
    from asvspoof2021_air_tpu.serving.stream import make_scanned_infer

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    assert on_tpu, "sweep is a device measurement; run on the TPU"
    quantize = {"bf16": False, "mfa": "mfa", "int8": True}[tier]

    lfcc = PallasLFCC()
    model = ECAPA_TDNN(C=512, model_scale=8, n_out=2, n_feat=60,
                       dtype=jnp.bfloat16)
    ocs = build_loss("ang_iso", enc_dim=256)
    rng = jax.random.PRNGKey(688)
    g = np.random.default_rng(0)
    wave = jnp.asarray(g.standard_normal((B, WAVE_LEN)), jnp.float32)
    labels = jnp.asarray((np.arange(B) % 2).astype(np.int32))
    variables = jax.jit(
        lambda w: model.init({"params": rng}, lfcc(w)[:2], False))(wave)
    loss_vars = ocs.init(rng, np.zeros((B, 256), np.float32), labels)

    def infer(w, lab):
        emb, logits = ecapa_apply_int8(
            variables, lfcc(w), model_scale=8, dtype=jnp.bfloat16,
            fused_chain=True, quantize=quantize)
        _loss, scores = ocs.apply(loss_vars, emb, lab)
        return scores

    scanned = make_scanned_infer(infer)
    waves = jnp.broadcast_to(wave, (scan_k,) + wave.shape)
    labs = jnp.broadcast_to(labels, (scan_k,) + labels.shape)
    jax.block_until_ready(scanned(waves, labs))  # compile

    def once():
        t0 = time.perf_counter()
        for _ in range(n_iter):
            o = scanned(waves, labs)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / (n_iter * scan_k)

    import bench

    dt, suspect, spread = bench._timed_attempts(once, floor_ms=1.5 * (B / 64))
    out = {"B": B, "tier": tier, "scan_k": scan_k,
           "ms_per_batch": round(dt * 1000, 3),
           "utt_s": round(B / dt, 1),
           "spread_pct": round(spread, 1)}
    if suspect:
        out["suspect_timing"] = True
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--tiers", nargs="+", default=["bf16"],
                    choices=["bf16", "mfa", "int8"])
    ap.add_argument("--scan_k", type=int, default=8)
    args = ap.parse_args()
    for tier in args.tiers:
        for B in args.b:
            print(json.dumps(measure_point(B, tier, scan_k=args.scan_k)),
                  flush=True)


if __name__ == "__main__":
    main()
