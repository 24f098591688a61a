"""Roofline accounting for the flagship inference graph (LFCC + ECAPA-512
+ OCSoftmax, B=64, T=750, bf16 compute).

Two outputs (docs/PERFORMANCE.md section "Roofline accounting"):
1. An analytic per-stage FLOP table derived from the model shapes
   (asvspoof2021_air_tpu/models/ecapa.py) plus XLA's own cost_analysis
   total as a cross-check.
2. On a TPU: measured per-stage times from independently jitted stage
   kernels with the production shapes — each stage's achieved TFLOP/s and
   % of chip peak, plus the full fused graph for comparison (the fused
   step is faster than the stage sum; the difference is XLA fusion).

Run: python tools/perf/roofline.py [--json]
"""

import argparse
import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

import jax
import jax.numpy as jnp

B, T, F, C, SCALE = 64, 750, 60, 512, 8
WIDTH = C // SCALE
WAVE_LEN = 119840
PEAK_BF16_TFLOPS = 197.0   # TPU v5e (lite) chip peak, bf16
HBM_GBPS = 819.0           # TPU v5e HBM bandwidth


def gf(n):
    return n / 1e9


def conv_flops(t, cin, cout, k):
    return 2 * B * t * k * cin * cout


def stage_defs():
    """(name, flops, builder) — builder returns (fn, args) with production
    shapes; fn is jittable and bf16 like the model."""
    g = np.random.default_rng(0)

    def r(*shape):
        return jnp.asarray(g.standard_normal(shape), jnp.bfloat16)

    stages = []

    # LFCC front-end (matmul-as-DFT formulation); measured via the real op
    def lfcc_builder():
        from asvspoof2021_air_tpu.ops.lfcc import LFCC
        lfcc = LFCC()
        wave = jnp.asarray(g.standard_normal((B, WAVE_LEN)), jnp.float32)
        return (lambda w: lfcc(w)), (wave,)
    # windowed DFT as matmul: (B, T, 320) @ (320, 514)
    stages.append(("lfcc_frontend",
                   2 * B * T * 320 * 514 + 2 * B * T * 257 * 20,
                   lfcc_builder))

    def stem_builder():
        x = r(B, T, F)
        w = r(5, F, C)
        fn = lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1,), [(2, 2)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        return fn, (x, w)
    stages.append(("stem_conv_k5_60_512", conv_flops(T, F, C, 5),
                   stem_builder))

    # per block: two 1x1 convs (512->512) ; x3 blocks
    def pw_builder():
        x = r(B, T, C)
        w = r(C, C)
        fn = lambda x, w: jnp.einsum("btc,cd->btd", x, w)
        return fn, (x, w)
    stages.append(("res2_1x1_convs_x6", 6 * conv_flops(T, C, C, 1),
                   pw_builder, 6))

    # the 64-wide sequential Res2 chain (7 convs, k=3) ; x3 blocks
    def chain_builder():
        x = r(B, T, C)
        ws = [r(3, WIDTH, WIDTH) for _ in range(SCALE - 1)]

        def fn(x, *ws):
            groups = jnp.split(x, SCALE, axis=-1)
            sp = None
            outs = []
            for i in range(SCALE - 1):
                sp = groups[i] if i == 0 else sp + groups[i]
                sp = jax.lax.conv_general_dilated(
                    sp, ws[i], (1,), [(2, 2)], rhs_dilation=(2,),
                    dimension_numbers=("NWC", "WIO", "NWC"))
                sp = jax.nn.relu(sp)
                outs.append(sp)
            outs.append(groups[-1])
            return jnp.concatenate(outs, axis=-1)
        return fn, (x, *ws)
    stages.append(("res2_64wide_chain_x3",
                   3 * (SCALE - 1) * conv_flops(T, WIDTH, WIDTH, 3),
                   chain_builder, 3))

    # SE module x3: pooled dense 512->256->512 + gate
    def se_builder():
        x = r(B, T, C)
        w1, w2 = r(C, 256), r(256, C)

        def fn(x, w1, w2):
            s = jnp.mean(x, axis=1)
            s = jax.nn.relu(s @ w1)
            s = jax.nn.sigmoid(s @ w2)
            return x * s[:, None, :]
        return fn, (x, w1, w2)
    stages.append(("se_module_x3", 3 * 2 * B * (C * 256 + 256 * C),
                   se_builder, 3))

    # MFA: 3 einsums (B,T,512)x(512,1536)
    def mfa_builder():
        xs = [r(B, T, C) for _ in range(3)]
        w = r(3 * C, 1536)

        def fn(x1, x2, x3, w):
            return (jnp.einsum("btc,cd->btd", x1, w[:C])
                    + jnp.einsum("btc,cd->btd", x2, w[C:2 * C])
                    + jnp.einsum("btc,cd->btd", x3, w[2 * C:]))
        return fn, (*xs, w)
    stages.append(("mfa_3x_512_1536", 3 * conv_flops(T, C, 1536, 1),
                   mfa_builder))

    # attention: 1536->128 matmul + 128->1536 conv + softmax + pooling
    def attn_builder():
        x = r(B, T, 1536)
        wa, wb = r(1536, 128), r(128, 1536)

        def fn(x, wa, wb):
            w = jax.nn.relu(jnp.einsum("btc,cd->btd", x, wa))
            w = jnp.einsum("btc,cd->btd", w, wb)
            w = jax.nn.softmax(w.astype(jnp.float32), axis=1)
            xf = x.astype(jnp.float32)
            mu = jnp.sum(xf * w, axis=1)
            sg = jnp.sqrt(jnp.clip(jnp.sum(xf ** 2 * w, axis=1) - mu ** 2,
                                   1e-4))
            return jnp.concatenate([mu, sg], axis=1)
        return fn, (x, wa, wb)
    stages.append(("attention_and_pooling",
                   conv_flops(T, 1536, 128, 1) + conv_flops(T, 128, 1536, 1)
                   + 4 * B * T * 1536,
                   attn_builder))

    # head: 3072->256->2 + OCSoftmax cosine
    def head_builder():
        x = r(B, 3072)
        w1, w2 = r(3072, 256), r(256, 2)

        def fn(x, w1, w2):
            f = x @ w1
            return f, f @ w2
        return fn, (x, w1, w2)
    stages.append(("head_fc", 2 * B * (3072 * 256 + 256 * 2), head_builder))

    return stages


MIN_PROGRAM_S = 0.04   # each compiled program spans at least this device time


def _chain(fn, k):
    """One compiled program = k serialized invocations of fn.

    lax.scan re-runs fn k times; an optimization_barrier threads each
    iteration's output into the next carry so XLA can neither batch the
    iterations nor dead-code any of them, while the carry value (and thus
    fn's input) is bit-identical every iteration. This is how sub-ms
    kernels become measurable here: the axon relay's per-dispatch timing is
    unreliable below a few ms REGARDLESS of loop length or process
    isolation (measured 2026-08-17 — isolated sub-ms stage readings came
    back at up to 28x chip peak), while multi-ms programs (the full fused
    graph, bench.py stages) time correctly."""
    def fk(*args):
        x, rest = args[0], args[1:]

        def body(carry, _):
            c, acc = carry
            out = fn(c, *rest)
            # barrier the outputs so no consumer-driven simplification
            # (e.g. slice-into-dot) can shrink fn's work, then keep one
            # element of EVERY leaf live via the returned accumulator —
            # an unused barrier result is itself dead-code-eliminated
            # (observed: the whole dot vanished from the compiled HLO)
            out = jax.lax.optimization_barrier(out)
            for leaf in jax.tree_util.tree_leaves(out):
                acc = acc + leaf.ravel()[:1].astype(jnp.float32)[0]
            # opaque carry: XLA cannot prove the next iteration's input
            # unchanged, so fn cannot be hoisted out of the loop
            return (jax.lax.optimization_barrier(c), acc), None

        (x, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), None,
                                   length=k)
        return x, acc
    return fk


def measure(fn, args, n_iter=30, flops=0, peak_tflops=None):
    """Device seconds per invocation of fn, measured as one k-way chained
    program (see _chain) and guarded against the axon relay's
    ack-without-execution glitch (.claude/skills/verify/SKILL.md): a reading
    is only plausible if it clears half the physical floor — the max of the
    compute-bound time (flops / chip peak) and the memory-bound time
    (input+output bytes / HBM bandwidth). Implausible readings are
    re-measured; if none of 8 attempts clears the floor, the max attempt is
    returned with suspect=True. Returns (seconds_per_call, suspect)."""
    del n_iter  # superseded by program chaining
    peak = (peak_tflops or PEAK_BF16_TFLOPS) * 1e12
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    bytes_moved = sum(a.nbytes for a in jax.tree_util.tree_leaves(args))
    bytes_moved += sum(o.nbytes for o in jax.tree_util.tree_leaves(out))
    physical = max(flops / peak, bytes_moved / (HBM_GBPS * 1e9), 1e-7)
    floor = 0.5 * physical
    k = min(4096, max(1, int(math.ceil(MIN_PROGRAM_S / physical))))
    chained = jax.jit(_chain(fn, k))
    jax.block_until_ready(chained(*args))

    def one():
        t0 = time.perf_counter()
        o = None
        for _ in range(3):
            o = chained(*args)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / (3 * k)

    return _guarded_timing(one, floor)


def _guarded_timing(one, floor, max_attempts=8, want=3):
    """Collect timing attempts from `one()` until `want` clear the
    plausibility `floor` (seconds); return (min plausible, False). If none
    of `max_attempts` clears it, return (max attempt, True) — the
    least-glitched reading, flagged suspect."""
    plausible, attempts = [], []
    for _ in range(max_attempts):
        dt = one()
        attempts.append(dt)
        if dt >= floor:
            plausible.append(dt)
            if len(plausible) >= want:
                break
    if plausible:
        return min(plausible), False
    return max(attempts), True


def full_graph():
    from asvspoof2021_air_tpu.losses import build_loss
    from asvspoof2021_air_tpu.models import ECAPA_TDNN
    from asvspoof2021_air_tpu.ops.lfcc import LFCC

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    lfcc = LFCC()
    if on_tpu:
        try:
            from asvspoof2021_air_tpu.ops.lfcc_pallas import PallasLFCC
            lfcc = PallasLFCC()
        except Exception:
            pass
    model = ECAPA_TDNN(C=C, model_scale=SCALE, n_out=2, n_feat=60,
                       dtype=jnp.bfloat16 if on_tpu else None)
    ocs = build_loss("ang_iso", enc_dim=256)
    rng = jax.random.PRNGKey(688)
    g = np.random.default_rng(0)
    wave = jnp.asarray(g.standard_normal((B, WAVE_LEN)), jnp.float32)
    labels = jnp.asarray((np.arange(B) % 2).astype(np.int32))
    variables = jax.jit(
        lambda w: model.init({"params": rng}, lfcc(w)[:2], False))(wave)
    loss_vars = ocs.init(rng, np.zeros((B, 256), np.float32), labels)

    def infer(w, lab):
        emb, logits = model.apply(variables, lfcc(w), False)
        _loss, scores = ocs.apply(loss_vars, emb, lab)
        return scores

    lowered = jax.jit(infer).lower(wave, labels)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    xla_flops = (cost or {}).get("flops", float("nan"))
    return infer, (wave, labels), xla_flops


def _measure_stage(spec, on_tpu):
    """One per-stage row; run at most one of these per process on TPU."""
    name, flops, builder = spec[0], spec[1], spec[2]
    reps = spec[3] if len(spec) > 3 else 1
    if not on_tpu:
        return {"stage": name, "gflop": round(gf(flops), 2)}
    fn, fargs = builder()
    dt, suspect = measure(fn, fargs, flops=flops / reps)
    dt *= reps
    tflops = flops / dt / 1e12
    row = {"stage": name, "gflop": round(gf(flops), 2),
           "ms": round(dt * 1000, 3),
           "tflops": round(tflops, 1),
           "pct_peak": round(100 * tflops / PEAK_BF16_TFLOPS, 1)}
    if suspect:
        row["suspect_timing"] = True
    return row


FULL_STAGE = "FULL fused graph (XLA)"


def _measure_full(on_tpu, total_flops):
    infer, iargs, xla_flops = full_graph()
    full = {"stage": FULL_STAGE,
            "gflop": round(gf(xla_flops), 2) if np.isfinite(xla_flops)
            else None,
            "analytic_gflop": round(gf(total_flops), 2)}
    if on_tpu:
        dt, suspect = measure(infer, iargs, n_iter=20, flops=total_flops)
        tflops = total_flops / dt / 1e12
        full.update({"ms": round(dt * 1000, 3),
                     "tflops": round(tflops, 1),
                     "pct_peak": round(100 * tflops / PEAK_BF16_TFLOPS, 1),
                     "utt_s": round(B / dt, 0)})
        if suspect:
            full["suspect_timing"] = True
    return full


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json", action="store_true")
    p.add_argument("--stage", default=None,
                   help="measure ONE stage (name from stage_defs, or "
                        "'full') and print its JSON row")
    p.add_argument("--isolated", action="store_true",
                   help="run each stage in its own subprocess (one compiled "
                        "program per process — the only reliable mode for "
                        "sub-ms kernels on the axon relay)")
    args = p.parse_args()

    specs = stage_defs()
    total_flops = sum(s[1] for s in specs)

    if args.stage is not None:
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        if args.stage == "full":
            row = _measure_full(on_tpu, total_flops)
        else:
            match = [s for s in specs if s[0] == args.stage]
            if not match:
                sys.exit(f"unknown stage {args.stage!r}; have "
                         f"{[s[0] for s in specs] + ['full']}")
            row = _measure_stage(match[0], on_tpu)
        print(json.dumps(row))
        return

    if args.isolated:
        rows = []
        for name in [s[0] for s in specs] + ["full"]:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--stage", name],
                capture_output=True, text=True, timeout=900)
            if proc.returncode != 0:
                rows.append({"stage": name, "error":
                             proc.stderr.strip().splitlines()[-1:]})
                continue
            rows.append(json.loads(proc.stdout.strip().splitlines()[-1]))
    else:
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        rows = [_measure_stage(s, on_tpu) for s in specs]
        rows.append(_measure_full(on_tpu, total_flops))

    full = rows[-1]
    stage_ms = [r.get("ms") for r in rows[:-1]]
    if all(m is not None for m in stage_ms) and "ms" in full:
        full["stage_sum_ms"] = round(sum(stage_ms), 3)
    if any(r.get("suspect_timing") for r in rows[:-1]):
        full["suspect_timing"] = True

    if args.json:
        print(json.dumps(rows))
    else:
        cols = ["stage", "gflop", "ms", "tflops", "pct_peak"]
        print(f"{'stage':34} {'GFLOP':>8} {'ms':>8} {'TF/s':>6} {'%peak':>6}")
        for r in rows:
            print(f"{r['stage']:34} {r.get('gflop', 0) or 0:8.2f} "
                  f"{r.get('ms', float('nan')) or float('nan'):8.3f} "
                  f"{r.get('tflops', float('nan')) or float('nan'):6.1f} "
                  f"{r.get('pct_peak', float('nan')) or float('nan'):6.1f}")
        extra = {k: v for k, v in rows[-1].items() if k not in cols}
        print("full-graph extras:", extra)


if __name__ == "__main__":
    main()
