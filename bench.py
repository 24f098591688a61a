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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_CPU_UTT_PER_SEC = 10.31  # see module docstring

B = 64
WAVE_LEN = 119840  # 750 LFCC frames at 16 kHz (7.49 s)


def main():
    from asvspoof2021_air_tpu.losses import build_loss
    from asvspoof2021_air_tpu.models import ECAPA_TDNN
    from asvspoof2021_air_tpu.ops.lfcc import LFCC
    from asvspoof2021_air_tpu.ops.lfcc_pallas import PallasLFCC
    from asvspoof2021_air_tpu.train.state import (
        create_train_state,
        make_backbone_optimizer,
        make_loss_optimizer,
        step_decay_schedule,
    )
    from asvspoof2021_air_tpu.train.steps import (
        StepConfig,
        make_multi_step,
        make_train_step,
    )

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

    variables = jax.jit(lambda w: model.init({"params": rng}, lfcc(w)[:2], False))(wave)
    loss_vars = ocs.init(rng, jnp.zeros((B, 256)), labels)

    # ---------------- inference ----------------
    @jax.jit
    def infer(w):
        emb, logits = model.apply(variables, lfcc(w), False)
        _loss, scores = ocs.apply(loss_vars, emb, labels)
        return scores

    jax.block_until_ready(infer(wave))  # compile
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = infer(wave)
    jax.block_until_ready(out)
    infer_dt = (time.perf_counter() - t0) / n_iter
    infer_utt_s = B / infer_dt

    # Serving sweet spot: B=128 measured fastest per-utterance on v5e
    # (train throughput is flat in batch — compute-bound — so only the
    # inference point is re-measured at the larger batch).
    wave128 = jnp.concatenate([wave, wave], axis=0)
    labels128 = jnp.concatenate([labels, labels], axis=0)

    @jax.jit
    def infer128(w):
        emb, logits = model.apply(variables, lfcc(w), False)
        _loss, scores = ocs.apply(loss_vars, emb, labels128)
        return scores

    jax.block_until_ready(infer128(wave128))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = infer128(wave128)
    jax.block_until_ready(out)
    infer128_utt_s = 2 * B / ((time.perf_counter() - t0) / n_iter)

    # ---------------- training step ----------------
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
    step_rng = jax.random.PRNGKey(1)
    adv_gate = jnp.float32(0.0)
    state, m = multi_step(state, batches, step_rng, adv_gate)
    jax.block_until_ready(m["total_loss"])  # compile
    n_train = 4
    t0 = time.perf_counter()
    for i in range(n_train):
        state, m = multi_step(state, batches, step_rng, adv_gate)
    jax.block_until_ready(m["total_loss"])
    train_dt = (time.perf_counter() - t0) / (n_train * K)
    train_utt_s = B / train_dt

    # ---------------- training step with on-device channel augmentation ----
    from asvspoof2021_air_tpu.ops.augment import (
        ChannelAugmenter,
        synthetic_ir_bank,
    )
    from asvspoof2021_air_tpu.train.frontend import OnDeviceFrontend

    fe = OnDeviceFrontend(
        feat_len=750, padding="repeat",
        augmenter=ChannelAugmenter(ir_bank=synthetic_ir_bank()),
        apply_ir=True, use_pallas=on_tpu,
    )
    aug_step = jax.jit(
        make_multi_step(
            make_train_step(model, ocs, btx, ltx,
                            StepConfig(add_loss="ang_iso"), frontend=fe),
            K,
        ),
        donate_argnums=(0,),
    )
    aug_wave_len = fe.min_samples()
    aug_batches = {
        "wave": jnp.broadcast_to(wave[:, :aug_wave_len], (K, B, aug_wave_len)),
        "length": jnp.full((K, B), aug_wave_len, jnp.int32),
        "label": jnp.broadcast_to(labels, (K, B)),
    }
    state2 = create_train_state(
        rng, model, lfcc(wave[:2]),
        loss_module=ocs,
        example_feat=jnp.zeros((B, 256)),
        example_labels=labels,
        backbone_tx=btx, loss_tx=ltx,
    )
    state2, m = aug_step(state2, aug_batches, step_rng, adv_gate, fe.params)
    jax.block_until_ready(m["total_loss"])
    t0 = time.perf_counter()
    for i in range(n_train):
        state2, m = aug_step(state2, aug_batches, step_rng, adv_gate,
                             fe.params)
    jax.block_until_ready(m["total_loss"])
    aug_dt = (time.perf_counter() - t0) / (n_train * K)
    aug_utt_s = B / aug_dt

    result = {
        "metric": "utterances/sec/chip, LFCC+ECAPA-512+OCSoftmax inference "
                  "(B=64, 7.49s audio, fused front-end, bf16 compute)",
        "value": round(infer_utt_s, 1),
        "unit": "utt/s/chip",
        "vs_baseline": round(infer_utt_s / BASELINE_CPU_UTT_PER_SEC, 1),
        "train_utt_s_per_chip": round(train_utt_s, 1),
        "train_aug_utt_s_per_chip": round(aug_utt_s, 1),
        "inference_b128_utt_s_per_chip": round(infer128_utt_s, 1),
        "inference_ms_per_batch": round(infer_dt * 1000, 2),
        "train_ms_per_step": round(train_dt * 1000, 2),
        "batch_size": B,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
