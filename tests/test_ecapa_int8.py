"""Int8-compute ECAPA serving forward (serving/ecapa_int8.py): the
quantized graph must track the f32 model.apply inference output from the
SAME variables tree — embedding direction preserved, logits close.

Quantization is lossy by design, so the gate is cosine similarity and a
loose absolute tolerance rather than elementwise parity (the bf16 path's
own cosine gate is >=0.9996; int8 per-tensor activations land near that).
Real-TPU throughput is measured by bench.py --stage infer_int8."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.models.ecapa import ECAPA_TDNN
from asvspoof2021_air_tpu.serving.ecapa_int8 import (
    _quant_w, calibrate_act_scales, ecapa_apply_int8)


def _cosine(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = np.sum(a * b, axis=-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / np.maximum(den, 1e-30)


def test_weight_quant_roundtrip_error_is_bounded():
    g = np.random.default_rng(0)
    w = jnp.asarray(g.standard_normal((64, 32)) * 0.1, jnp.float32)
    w8, s = _quant_w(w)
    assert w8.dtype == jnp.int8
    back = np.asarray(w8, np.float32) * np.asarray(s)
    # symmetric per-channel quant: max error is half an LSB of each column
    lsb = np.asarray(s)
    assert np.all(np.abs(back - np.asarray(w)) <= 0.5 * lsb + 1e-9)


@pytest.mark.parametrize("model_scale", [4, 8])
def test_int8_forward_tracks_f32_model(model_scale):
    B, T, C, enc = 3, 48, 64, 32
    model = ECAPA_TDNN(C=C, model_scale=model_scale, n_out=2, n_feat=60,
                       enc_dim=enc)
    g = np.random.default_rng(1)
    feats = jnp.asarray(g.standard_normal((B, T, 60)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats, False)
    # randomize BN stats so stat folding is actually exercised
    variables = jax.tree.map(
        lambda v: v + 0.05 * jnp.asarray(
            np.random.default_rng(2).standard_normal(v.shape), v.dtype),
        variables,
    )

    want_feat, want_logits = model.apply(variables, feats, False)
    got_feat, got_logits = ecapa_apply_int8(
        variables, feats, model_scale=model_scale, enc_dim=enc,
        dtype=jnp.float32, interpret=True,
    )

    cos = _cosine(np.asarray(got_feat), np.asarray(want_feat))
    assert np.all(cos > 0.999), cos
    # logits drive score ordering; direction and rough magnitude must hold
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(want_logits), atol=0.05, rtol=0.1)


def test_calibrated_static_scales_track_f32_model():
    """Static calibrated activation scales (no dynamic max-reduce in the
    serving graph) must stay as close to the f32 model as the dynamic
    path, on data drawn from the calibration distribution."""
    B, T, C, enc = 3, 48, 64, 32
    model = ECAPA_TDNN(C=C, model_scale=4, n_out=2, n_feat=60, enc_dim=enc)
    g = np.random.default_rng(7)
    calib = [jnp.asarray(g.standard_normal((B, T, 60)), jnp.float32)
             for _ in range(2)]
    feats = jnp.asarray(g.standard_normal((B, T, 60)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(2)}, feats, False)

    scales = calibrate_act_scales(variables, calib, model_scale=4,
                                  enc_dim=enc, interpret=True,
                                  headroom=1.1)
    assert set(scales) == {"b0_in", "b0_out", "b1_in", "b1_out",
                           "b2_in", "b2_out", "mfa_0", "mfa_1", "mfa_2"}
    assert all(s > 0 for s in scales.values())

    want_feat, _ = model.apply(variables, feats, False)
    got_feat, got_logits = jax.jit(
        lambda v, f: ecapa_apply_int8(v, f, model_scale=4, enc_dim=enc,
                                      dtype=jnp.float32, interpret=True,
                                      act_scales=scales))(variables, feats)
    cos = _cosine(np.asarray(got_feat), np.asarray(want_feat))
    assert np.all(cos > 0.999), cos
    assert np.all(np.isfinite(np.asarray(got_logits)))


def test_int8_forward_is_jittable_and_deterministic():
    B, T, C, enc = 2, 48, 64, 32
    model = ECAPA_TDNN(C=C, model_scale=4, n_out=2, n_feat=60, enc_dim=enc)
    g = np.random.default_rng(3)
    feats = jnp.asarray(g.standard_normal((B, T, 60)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(1)}, feats, False)

    fn = jax.jit(lambda v, f: ecapa_apply_int8(
        v, f, model_scale=4, enc_dim=enc, dtype=jnp.float32,
        interpret=True))
    e1, l1 = fn(variables, feats)
    e2, l2 = fn(variables, feats)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


@pytest.mark.parametrize("T", [47, 48])
def test_fused_chain_tracks_f32_model(T):
    """fused_chain=True (VMEM-resident Res2 chain kernel + aligned-T
    trunk with masked statistics) must track the f32 model as closely as
    the plain int8 path — including when T is not a multiple of 8 and
    the trunk runs padded (tests/test_res2_chain_pallas.py covers the
    kernel-level masking)."""
    B, C, enc = 3, 64, 32
    model = ECAPA_TDNN(C=C, model_scale=8, n_out=2, n_feat=60, enc_dim=enc)
    g = np.random.default_rng(4)
    feats = jnp.asarray(g.standard_normal((B, T, 60)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats, False)
    variables = jax.tree.map(
        lambda v: v + 0.05 * jnp.asarray(
            np.random.default_rng(5).standard_normal(v.shape), v.dtype),
        variables,
    )

    want_feat, want_logits = model.apply(variables, feats, False)
    got_feat, got_logits = ecapa_apply_int8(
        variables, feats, model_scale=8, enc_dim=enc,
        dtype=jnp.float32, interpret=True, fused_chain=True,
    )
    cos = _cosine(np.asarray(got_feat), np.asarray(want_feat))
    assert np.all(cos > 0.999), cos
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(want_logits), atol=0.05, rtol=0.1)


def test_bf16_tier_quantize_false_matches_f32_model():
    """quantize=False + fused_chain: the bf16 serving tier (same fused
    kernels, no quantization) must match the f32 model even closer than
    the int8 path."""
    B, T, C, enc = 2, 47, 64, 32
    model = ECAPA_TDNN(C=C, model_scale=8, n_out=2, n_feat=60, enc_dim=enc)
    g = np.random.default_rng(6)
    feats = jnp.asarray(g.standard_normal((B, T, 60)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(1)}, feats, False)
    variables = jax.tree.map(
        lambda v: v + 0.05 * jnp.asarray(
            np.random.default_rng(7).standard_normal(v.shape), v.dtype),
        variables,
    )
    want_feat, want_logits = model.apply(variables, feats, False)
    got_feat, got_logits = ecapa_apply_int8(
        variables, feats, model_scale=8, enc_dim=enc,
        dtype=jnp.float32, interpret=True, fused_chain=True,
        quantize=False,
    )
    np.testing.assert_allclose(np.asarray(got_feat), np.asarray(want_feat),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits), atol=2e-3, rtol=1e-3)


def test_mfa_only_tier_tracks_f32_model():
    """quantize="mfa": int8 only on the MFA projection (the graph's
    biggest matmul stage), 1x1 convs kept in the compute dtype. Must
    track the f32 model at least as closely as the full-int8 path —
    fewer quantized sites, strictly less quantization error."""
    B, T, C, enc = 3, 48, 64, 32
    model = ECAPA_TDNN(C=C, model_scale=8, n_out=2, n_feat=60, enc_dim=enc)
    g = np.random.default_rng(8)
    feats = jnp.asarray(g.standard_normal((B, T, 60)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(3)}, feats, False)
    variables = jax.tree.map(
        lambda v: v + 0.05 * jnp.asarray(
            np.random.default_rng(9).standard_normal(v.shape), v.dtype),
        variables,
    )
    want_feat, want_logits = model.apply(variables, feats, False)
    got_feat, got_logits = ecapa_apply_int8(
        variables, feats, model_scale=8, enc_dim=enc,
        dtype=jnp.float32, interpret=True, fused_chain=True,
        quantize="mfa",
    )
    cos = _cosine(np.asarray(got_feat), np.asarray(want_feat))
    assert np.all(cos > 0.999), cos
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(want_logits), atol=0.05, rtol=0.1)


def test_int8_eer_delta_on_synthetic_corpus():
    """Corpus-level accuracy gate (round-3 verdict item 8): train a tiny
    flagship on a synthetic separable corpus, score a held-out set
    through the f32 path AND the int8 serving path, and assert the EER
    is unchanged. This closes the gap the cosine/logit tests leave:
    score ORDER around the operating point is what serving must
    preserve."""
    import jax

    from asvspoof2021_air_tpu.losses import build_loss
    from asvspoof2021_air_tpu.metrics.eer import compute_eer
    from asvspoof2021_air_tpu.train.state import (
        create_train_state, make_backbone_optimizer, make_loss_optimizer)
    from asvspoof2021_air_tpu.train.steps import StepConfig, make_train_step

    B, T, C, enc = 8, 48, 64, 32
    model = ECAPA_TDNN(C=C, model_scale=4, n_out=2, n_feat=60, enc_dim=enc)
    loss_mod = build_loss("ang_iso", enc_dim=enc, r_real=0.9, r_fake=0.2,
                          alpha=20.0)
    g = np.random.default_rng(11)
    labels = (np.arange(B) % 2).astype(np.int32)
    n_steps = 40
    sep = 0.25
    feats = (g.standard_normal((n_steps, B, T, 60))
             + sep * labels[None, :, None, None]).astype(np.float32)

    btx = make_backbone_optimizer(lambda _: 1e-3)
    ltx = make_loss_optimizer(lambda _: 1e-3)
    state = create_train_state(
        jax.random.PRNGKey(0), model, jnp.asarray(feats[0]),
        loss_module=loss_mod, example_feat=jnp.zeros((B, enc)),
        example_labels=jnp.asarray(labels), backbone_tx=btx, loss_tx=ltx)
    step = jax.jit(make_train_step(model, loss_mod, btx, ltx,
                                   StepConfig(add_loss="ang_iso")))
    for s in range(n_steps):
        state, _ = step(state, {"feat": jnp.asarray(feats[s]),
                                "label": jnp.asarray(labels)},
                        jax.random.PRNGKey(s))

    n_hold = 64
    hold_labels = (np.arange(n_hold) % 2).astype(np.int32)
    hold = (g.standard_normal((n_hold, T, 60))
            + sep * hold_labels[:, None, None]).astype(np.float32)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    emb_f32, _ = model.apply(variables, jnp.asarray(hold), False)
    calib = [jnp.asarray(feats[s]) for s in range(2)]
    scales = calibrate_act_scales(variables, calib, model_scale=4,
                                  enc_dim=enc, interpret=True)
    emb_i8, _ = ecapa_apply_int8(variables, jnp.asarray(hold),
                                 model_scale=4, enc_dim=enc,
                                 dtype=jnp.float32, interpret=True,
                                 act_scales=scales)

    def eer_of(emb):
        _, score = loss_mod.apply({"params": state.loss_params}, emb,
                                  jnp.asarray(hold_labels))
        # ang_iso returns -cos: negate so bona fide (label 0, pushed
        # to high cos) is the high-scoring target class
        s = -np.asarray(score)
        eer, _ = compute_eer(s[hold_labels == 0], s[hold_labels == 1])
        return eer

    eer_f32 = eer_of(emb_f32)
    eer_i8 = eer_of(emb_i8)
    # trained system must actually separate the classes
    assert eer_f32 < 0.25
    # the quantized path reproduces the corpus-level operating point
    assert abs(eer_f32 - eer_i8) <= 1.0 / 32 + 1e-9, (
        f"int8 EER moved: f32 {eer_f32:.4f} vs int8 {eer_i8:.4f}")
