"""Benchmark: flagship-pipeline throughput on the attached accelerator.

Measures utterances/sec/chip for the full on-device scoring pipeline of the
reference's primary paper system — batched waveforms -> fused LFCC front-end
-> ECAPA-TDNN-512 -> OC-Softmax score — at the reference configuration
(7.49 s audio = 750 LFCC frames, cf. /root/reference/main_train.py:43), plus
the full training-step throughput (forward+backward+dual optimizer update).

Baseline: the reference scores utterances serially at batch_size=1
(/root/reference/generate_score.py:73) on a CPU-bound pipeline. The recorded
baseline (10.31 utt/s) is this repo's own pipeline run the same way —
batch 1, single host CPU core, XLA CPU backend — measured on this machine
(2026-08-16); it is an upper bound on the torch reference's per-utterance
scoring rate here (the reference additionally pays torch.load feature IO per
utterance with num_workers=0, /root/reference/main_train.py:63).

Measurement stages run sequentially in-process by default (setup compiles
are shared, keeping total wall time bounded for the round driver).
Interleaving jitted programs in one process costs ~5% on this backend's
relay (executable-cache sensitivity, documented in
.claude/skills/verify/SKILL.md); `--isolated` runs each stage in its own
subprocess for clean-room numbers, and `--stage <name>` runs a single
stage in-process.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_CPU_UTT_PER_SEC = 10.31  # see module docstring

B = 64
WAVE_LEN = 119840  # 750 LFCC frames at 16 kHz (7.49 s)


def _timed_attempts(measure, floor_ms: float, attempts: int = 5):
    """Run `measure()` (returns seconds per unit) `attempts` times and
    return (median_dt_seconds, suspect, spread_pct).

    Two failure modes of this backend are guarded (threat model documented
    in docs/PERFORMANCE.md "Headline rule" and .claude/skills/verify/
    SKILL.md): (1) the axon relay can rarely ack a dispatch burst without
    the device work having run, producing a physically impossible fast
    reading — attempts under `floor_ms` are discarded; if ALL attempts are
    implausible the MAX is recorded with suspect=True so BENCH json never
    contains an impossible number flying under a plausible flag. (2)
    run-to-run relay variance of up to ~10% depending on the process's
    program mix — every recorded number is therefore the MEDIAN of the
    plausible attempts and the observed spread (max-min)/median is
    returned so BENCH_r*.json carries its own error bar."""
    dts = [measure() for _ in range(attempts)]
    valid = [dt for dt in dts if dt * 1000 >= floor_ms]
    if not valid:
        # all attempts implausible: the spread of glitched readings is
        # not an error bar — record None so consumers don't treat it as one
        return max(dts), True, None
    return float(np.median(valid)), False, _spread_pct(valid)


def _spread_pct(dts) -> float:
    med = float(np.median(dts))
    return 100.0 * (max(dts) - min(dts)) / med if med > 0 else 0.0


def _flagship():
    import jax
    import jax.numpy as jnp

    from asvspoof2021_air_tpu.losses import build_loss
    from asvspoof2021_air_tpu.models import ECAPA_TDNN
    from asvspoof2021_air_tpu.ops.lfcc import LFCC
    from asvspoof2021_air_tpu.ops.lfcc_pallas import PallasLFCC

    # Fused Pallas front-end on TPU; jnp fallback elsewhere.
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    try:
        lfcc = PallasLFCC() if on_tpu else LFCC()
    except Exception:
        lfcc = LFCC()
    # bf16 compute (f32 params) is the serving/training configuration on
    # TPU: MXU-native, ~1.4-1.5x over f32 at >0.999 embedding cosine.
    dtype = jnp.bfloat16 if on_tpu else None
    model = ECAPA_TDNN(C=512, model_scale=8, n_out=2, n_feat=60, dtype=dtype)
    ocs = build_loss("ang_iso", enc_dim=256)

    rng = jax.random.PRNGKey(688)
    g = np.random.default_rng(0)
    wave = jnp.asarray(g.standard_normal((B, WAVE_LEN)), jnp.float32)
    labels = jnp.asarray((np.arange(B) % 2).astype(np.int32))
    return on_tpu, lfcc, model, ocs, rng, wave, labels


def _train_state(rng, model, lfcc, wave, labels, ocs):
    import jax.numpy as jnp

    from asvspoof2021_air_tpu.train.state import (
        create_train_state,
        make_backbone_optimizer,
        make_loss_optimizer,
        step_decay_schedule,
    )

    sched = step_decay_schedule(5e-4, 0.5, 30, steps_per_epoch=100)
    btx = make_backbone_optimizer(sched)
    ltx = make_loss_optimizer(sched)
    state = create_train_state(
        rng, model, lfcc(wave[:2]),
        loss_module=ocs,
        example_feat=jnp.zeros((B, 256)),
        example_labels=labels,
        backbone_tx=btx, loss_tx=ltx,
    )
    return state, btx, ltx


def stage_infer(batch_mults=(1,)) -> dict:
    """B=64 serving point; `python bench.py --stage infer_b128` additionally
    measures B=128. The fused-graph batch re-sweep (tools/perf/
    serving_sweep.py, docs/PERFORMANCE.md) found B=128 ~3% faster than
    B=64 on the fused scan path — the headline stage measures B=128
    itself; this stage keeps the B=64 ladder comparable across rounds."""
    import jax

    _on_tpu, lfcc, model, ocs, rng, wave, labels = _flagship()
    variables = jax.jit(
        lambda w: model.init({"params": rng}, lfcc(w)[:2], False)
    )(wave)
    loss_vars = ocs.init(rng, np.zeros((B, 256), np.float32), labels)

    @jax.jit
    def infer(w, lab):
        emb, logits = model.apply(variables, lfcc(w), False)
        _loss, scores = ocs.apply(loss_vars, emb, lab)
        return scores

    out = {}
    import jax.numpy as jnp

    for mult in batch_mults:
        w = jnp.concatenate([wave] * mult, axis=0)
        lab = jnp.concatenate([labels] * mult, axis=0)
        jax.block_until_ready(infer(w, lab))  # compile
        n_iter = 20

        def measure():
            t0 = time.perf_counter()
            for _ in range(n_iter):
                o = infer(w, lab)
            jax.block_until_ready(o)
            return (time.perf_counter() - t0) / n_iter

        dt, suspect, spread = _timed_attempts(measure, floor_ms=2.0 * mult)
        out[f"b{mult * B}"] = {"utt_s": mult * B / dt,
                               "ms_per_batch": dt * 1000,
                               "spread_pct": None if spread is None else round(spread, 1)}
        if suspect:
            out[f"b{mult * B}"]["suspect_timing"] = True
    return out


def _bench_train_step(step_fn, state, batches, n_train=4, K=8):
    import jax

    state, m = step_fn(state, batches, jax.random.PRNGKey(1), 0.0)
    jax.block_until_ready(m["total_loss"])  # compile
    holder = {"state": state}

    def measure():
        t0 = time.perf_counter()
        s = holder["state"]
        for _ in range(n_train):
            s, m = step_fn(s, batches, jax.random.PRNGKey(1), 0.0)
        jax.block_until_ready(m["total_loss"])
        holder["state"] = s
        return (time.perf_counter() - t0) / (n_train * K)

    return _timed_attempts(measure, floor_ms=4.0)


def stage_train() -> dict:
    import jax
    import jax.numpy as jnp

    from asvspoof2021_air_tpu.train.steps import (
        StepConfig,
        make_multi_step,
        make_train_step,
    )

    _on_tpu, lfcc, model, ocs, rng, wave, labels = _flagship()
    # Differentiable fused attentive pooling (ops/attn_pool_vjp) + the
    # recompute-VJP fused BN (ops/bn_relu_vjp): combined A/B measured
    # 23.4 -> 22.4 ms/step on v5e (docs/PERFORMANCE.md "Fused-kernel A/B").
    model = model.clone(fused_pool=_on_tpu, fused_bn=_on_tpu)
    state, btx, ltx = _train_state(rng, model, lfcc, wave, labels, ocs)
    step_fn = make_train_step(
        model, ocs, btx, ltx, StepConfig(add_loss="ang_iso"),
        frontend=lambda b, k, p=None: lfcc(b["wave"]),
    )
    # Production dispatch shape: scan K optimizer steps per device call
    # (train CLI --steps_per_call); amortizes the ~6 ms per-dispatch latency
    # of this backend. Semantically identical to K single steps (per-step
    # keys derive from state.step inside the step).
    K = 8
    multi_step = jax.jit(make_multi_step(step_fn, K), donate_argnums=(0,))
    batches = {
        "wave": jnp.broadcast_to(wave, (K, B, WAVE_LEN)),
        "label": jnp.broadcast_to(labels, (K, B)),
    }
    dt, suspect, spread = _bench_train_step(multi_step, state, batches, K=K)
    out = {"utt_s": B / dt, "ms_per_step": dt * 1000,
           "spread_pct": None if spread is None else round(spread, 1)}
    if suspect:
        out["suspect_timing"] = True
    return out


def stage_train_aug() -> dict:
    import jax
    import jax.numpy as jnp

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

    on_tpu, lfcc, model, ocs, rng, wave, labels = _flagship()
    model = model.clone(fused_pool=on_tpu, fused_bn=on_tpu)
    state, btx, ltx = _train_state(rng, model, lfcc, wave, labels, ocs)
    fe = OnDeviceFrontend(
        feat_len=750, padding="repeat",
        augmenter=ChannelAugmenter(ir_bank=synthetic_ir_bank()),
        apply_ir=True, use_pallas=on_tpu,
    )
    K = 8
    aug_step = jax.jit(
        make_multi_step(
            make_train_step(model, ocs, btx, ltx,
                            StepConfig(add_loss="ang_iso"), frontend=fe),
            K,
        ),
        donate_argnums=(0,),
    )
    aug_wave_len = fe.min_samples()
    batches = {
        "wave": jnp.broadcast_to(wave[:, :aug_wave_len], (K, B, aug_wave_len)),
        "length": jnp.full((K, B), aug_wave_len, jnp.int32),
        "label": jnp.broadcast_to(labels, (K, B)),
    }

    def step(state, b, k, gate):
        return aug_step(state, b, k, gate, fe.params)

    dt, suspect, spread = _bench_train_step(step, state, batches, K=K)
    out = {"utt_s": B / dt, "ms_per_step": dt * 1000,
           "spread_pct": None if spread is None else round(spread, 1)}
    if suspect:
        out["suspect_timing"] = True
    return out


def stage_infer_fused() -> dict:
    """Serving path with the fused Pallas attention-pooling kernel
    (serving/ecapa_fused.py): vs stage_infer this replaces the HBM-bound
    attention/softmax/stats section with one VMEM-resident kernel.
    Measured as the round-2 structural perf experiment (docs/
    PERFORMANCE.md roofline section records the result either way)."""
    import jax
    import jax.numpy as jnp

    from asvspoof2021_air_tpu.serving import ecapa_apply_fused

    on_tpu, lfcc, model, ocs, rng, wave, labels = _flagship()
    variables = jax.jit(
        lambda w: model.init({"params": rng}, lfcc(w)[:2], False)
    )(wave)
    loss_vars = ocs.init(rng, np.zeros((B, 256), np.float32), labels)
    dtype = jnp.bfloat16 if on_tpu else None

    @jax.jit
    def infer(w, lab):
        emb, logits = ecapa_apply_fused(
            variables, lfcc(w), C=512, model_scale=8, dtype=dtype,
        )
        _loss, scores = ocs.apply(loss_vars, emb, lab)
        return scores

    jax.block_until_ready(infer(wave, labels))  # compile
    n_iter = 20

    def measure():
        t0 = time.perf_counter()
        for _ in range(n_iter):
            o = infer(wave, labels)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / n_iter

    dt, suspect, spread = _timed_attempts(measure, floor_ms=2.0)
    out = {"utt_s": B / dt, "ms_per_batch": dt * 1000,
           "spread_pct": None if spread is None else round(spread, 1)}
    if suspect:
        out["suspect_timing"] = True
    return out


def stage_infer_int8() -> dict:
    """Serving path with int8 matmul compute on the trunk's 1x1/MFA
    matmuls (serving/ecapa_int8.py) + the fused pooling kernel: probes
    whether the v5e's 2x int8 MXU throughput survives the added
    quantize/dequantize traffic end to end. Numerics pinned by
    tests/test_ecapa_int8.py."""
    import jax
    import jax.numpy as jnp

    from asvspoof2021_air_tpu.serving.ecapa_int8 import ecapa_apply_int8

    on_tpu, lfcc, model, ocs, rng, wave, labels = _flagship()
    variables = jax.jit(
        lambda w: model.init({"params": rng}, lfcc(w)[:2], False)
    )(wave)
    loss_vars = ocs.init(rng, np.zeros((B, 256), np.float32), labels)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    @jax.jit
    def infer(w, lab):
        emb, logits = ecapa_apply_int8(
            variables, lfcc(w), model_scale=8, dtype=dtype,
            interpret=not on_tpu, fused_chain=on_tpu,
        )
        _loss, scores = ocs.apply(loss_vars, emb, lab)
        return scores

    jax.block_until_ready(infer(wave, labels))  # compile
    n_iter = 20

    def measure():
        t0 = time.perf_counter()
        for _ in range(n_iter):
            o = infer(wave, labels)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / n_iter

    dt, suspect, spread = _timed_attempts(measure, floor_ms=1.5)
    out = {"utt_s": B / dt, "ms_per_batch": dt * 1000,
           "spread_pct": None if spread is None else round(spread, 1)}
    if suspect:
        out["suspect_timing"] = True
    return out


def stage_infer_scan(scan_k: int = 8, quantize: bool = True,
                     batch_mult: int = 1) -> dict:
    """Fused serving graph scanned over K stacked batches in ONE dispatch
    (serving/stream.py): amortizes the relay's ~1.4 ms/batch
    non-overlapped dispatch latency that the device-trace roofline
    exposed (docs/PERFORMANCE.md). Scores are bit-identical to the
    matching per-batch path. ``quantize=False`` measures the bf16 tier
    with the same fused kernels — after the fused-chain kernel it edges
    out int8 (the quantize passes cost more than the 2x MXU rate buys
    on this graph). ``batch_mult`` scales the batch: with the fused
    kernels the per-batch fixed costs shrank enough that B=128 edges out
    B=64 by ~3% (tools/perf/serving_sweep.py, 2026-08-19)."""
    import jax
    import jax.numpy as jnp

    on_tpu, lfcc, model, ocs, rng, wave, labels = _flagship()
    if batch_mult > 1:
        g = np.random.default_rng(1)
        wave = jnp.asarray(
            g.standard_normal((B * batch_mult, WAVE_LEN)), jnp.float32)
        labels = jnp.asarray(
            (np.arange(B * batch_mult) % 2).astype(np.int32))
    return _infer_scan_measure(on_tpu, lfcc, model, ocs, rng, wave, labels,
                               scan_k=scan_k, quantize=quantize)


def _infer_scan_measure(on_tpu, lfcc, model, ocs, rng, wave, labels, *,
                        scan_k: int, quantize) -> dict:
    import jax
    import jax.numpy as jnp

    from asvspoof2021_air_tpu.serving.ecapa_int8 import ecapa_apply_int8
    from asvspoof2021_air_tpu.serving.stream import make_scanned_infer

    nb = wave.shape[0]
    variables = jax.jit(
        lambda w: model.init({"params": rng}, lfcc(w)[:2], False)
    )(wave)
    loss_vars = ocs.init(rng, np.zeros((nb, 256), np.float32), labels)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    def infer(w, lab):
        emb, logits = ecapa_apply_int8(
            variables, lfcc(w), model_scale=8, dtype=dtype,
            interpret=not on_tpu, fused_chain=on_tpu, quantize=quantize,
        )
        _loss, scores = ocs.apply(loss_vars, emb, lab)
        return scores

    scanned = make_scanned_infer(infer)
    waves = jnp.broadcast_to(wave, (scan_k,) + wave.shape)
    labs = jnp.broadcast_to(labels, (scan_k,) + labels.shape)
    jax.block_until_ready(scanned(waves, labs))  # compile
    n_iter = 6

    def measure():
        t0 = time.perf_counter()
        for _ in range(n_iter):
            o = scanned(waves, labs)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / (n_iter * scan_k)

    dt, suspect, spread = _timed_attempts(measure, floor_ms=1.5 * (nb / B))
    out = {"utt_s": nb / dt, "ms_per_batch": dt * 1000, "scan_k": scan_k,
           "batch_size": nb, "spread_pct": None if spread is None else round(spread, 1)}
    if suspect:
        out["suspect_timing"] = True
    return out


STAGES = {"infer": stage_infer, "train": stage_train,
          "train_aug": stage_train_aug,
          "infer_fused": stage_infer_fused,
          "infer_int8": stage_infer_int8,
          "infer_scan": stage_infer_scan,
          "infer_bf16_scan": lambda: stage_infer_scan(quantize=False),
          "infer_mfa8_scan": lambda: stage_infer_scan(quantize="mfa"),
          "infer_bf16_scan_b128": lambda: stage_infer_scan(quantize=False,
                                                           batch_mult=2),
          "infer_b128": lambda: stage_infer(batch_mults=(1, 2))}


def _run_stage_subprocess(name: str) -> dict:
    """Run one stage in a fresh process (isolated executable cache)."""
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--stage", name],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        timeout=1200,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"stage {name} rc={proc.returncode}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def _start_watchdog(seconds: float):
    """The axon TPU relay can wedge for hours (device calls hang on the
    tunnel socket, .claude/skills/verify/SKILL.md). Rather than hanging
    the round driver, print an explicit error JSON and exit non-zero if
    the benchmark has not finished in time."""
    import os
    import threading

    def fire():
        print(json.dumps({
            "metric": "utterances/sec/chip, LFCC+ECAPA-512+OCSoftmax "
                      "inference",
            "value": 0,
            "unit": "utt/s/chip",
            "vs_baseline": 0,
            "error": f"benchmark watchdog fired after {seconds:.0f}s — "
                     "TPU backend unreachable (wedged relay?)",
        }), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    _start_watchdog(float(os.environ.get("BENCH_WATCHDOG_S", "1500")))
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        print(json.dumps(STAGES[sys.argv[2]]()))
        return
    isolated = "--isolated" in sys.argv[1:]

    import jax

    # Serving has three configurations on TPU: the standard bf16 forward,
    # the fused Pallas attention-pooling path (serving/ecapa_fused), and
    # the int8-compute path (serving/ecapa_int8, 2x MXU throughput on the
    # 1x1/MFA matmuls). All are numerically pinned against the standard
    # forward (tests/test_attn_pool_pallas.py, tests/test_ecapa_int8.py);
    # measure each and headline the best.
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    stage_names = (("infer", "infer_fused", "infer_int8", "infer_scan",
                    "infer_bf16_scan", "infer_bf16_scan_b128",
                    "train", "train_aug") if on_tpu
                   else ("infer", "train", "train_aug"))

    results = {}
    for name in stage_names:
        if isolated:
            try:
                results[name] = _run_stage_subprocess(name)
                results[name]["isolated"] = True
                continue
            except Exception as e:
                # fall back in-process, but say so — "clean-room" numbers
                # must never silently come from the shared process
                print(f"bench: isolated stage {name} failed ({e}); "
                      f"falling back in-process", file=sys.stderr)
        results[name] = STAGES[name]()
        if isolated:
            results[name]["isolated"] = False

    result = _assemble_result(results, str(jax.devices()[0]))
    if isolated:
        result["isolated"] = {n: results[n].get("isolated", False)
                              for n in stage_names}
    print(json.dumps(result))


def _assemble_result(results: dict, device: str) -> dict:
    """Fold per-stage measurements into the ONE-line driver JSON. The
    headline is the best non-suspect serving path (standard forward vs the
    fused Pallas attention-pooling serving graph)."""
    infer64 = results["infer"]["b64"]
    serving = {"standard": infer64}
    if "infer_fused" in results:
        serving["fused_attn_pool"] = results["infer_fused"]
    if "infer_int8" in results:
        serving["int8"] = results["infer_int8"]
    if "infer_scan" in results:
        serving["int8_scan"] = results["infer_scan"]
    if "infer_bf16_scan" in results:
        serving["bf16_scan"] = results["infer_bf16_scan"]
    if "infer_bf16_scan_b128" in results:
        serving["bf16_scan_b128"] = results["infer_bf16_scan_b128"]
    # Headline rule (docs/PERFORMANCE.md): every candidate is a median-of-5
    # measurement; candidates with suspect timing OR an observed spread over
    # 10% (the documented relay program-mix sensitivity) are excluded from
    # headline selection, falling back to the full set only if nothing
    # qualifies (in which case suspect_variance is emitted).
    viable = {k: v for k, v in serving.items()
              if not v.get("suspect_timing")
              and v.get("spread_pct", 0.0) <= 10.0}
    suspect_variance = not viable
    if not viable:
        viable = {k: v for k, v in serving.items()
                  if not v.get("suspect_timing")} or serving
    best_name = max(viable, key=lambda k: viable[k]["utt_s"])
    best = serving[best_name]
    best_bs = best.get("batch_size", B)
    result = {
        "metric": "utterances/sec/chip, LFCC+ECAPA-512+OCSoftmax inference "
                  f"(B={best_bs}, 7.49s audio, fused front-end, best "
                  "serving path)",
        "value": round(best["utt_s"], 1),
        "unit": "utt/s/chip",
        "vs_baseline": round(best["utt_s"] / BASELINE_CPU_UTT_PER_SEC, 1),
        "train_utt_s_per_chip": round(results["train"]["utt_s"], 1),
        "train_aug_utt_s_per_chip": round(results["train_aug"]["utt_s"], 1),
        "inference_ms_per_batch": round(best["ms_per_batch"], 2),
        "train_ms_per_step": round(results["train"]["ms_per_step"], 2),
        "serving_path": best_name,
        "spread_pct": best.get("spread_pct"),
        "train_spread_pct": results["train"].get("spread_pct"),
        "train_aug_spread_pct": results["train_aug"].get("spread_pct"),
        "infer_standard_utt_s": round(infer64["utt_s"], 1),
        "batch_size": best_bs,
        "device": device,
    }
    if "infer_fused" in results:
        result["infer_fused_utt_s"] = round(
            results["infer_fused"]["utt_s"], 1)
    if "infer_int8" in results:
        result["infer_int8_utt_s"] = round(
            results["infer_int8"]["utt_s"], 1)
    if "infer_scan" in results:
        result["infer_scan_utt_s"] = round(
            results["infer_scan"]["utt_s"], 1)
    if "infer_bf16_scan" in results:
        result["infer_bf16_scan_utt_s"] = round(
            results["infer_bf16_scan"]["utt_s"], 1)
    if "infer_bf16_scan_b128" in results:
        result["infer_bf16_scan_b128_utt_s"] = round(
            results["infer_bf16_scan_b128"]["utt_s"], 1)
    if any(v.get("suspect_timing") for v in (best, infer64, results["train"],
                                             results["train_aug"])):
        result["suspect_timing"] = True
    if suspect_variance:
        result["suspect_variance"] = True
    return result


if __name__ == "__main__":
    main()
