"""Train/eval step tests on an 8-device virtual CPU mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.losses import build_loss
from asvspoof2021_air_tpu.models import ChannelClassifier, ECAPA_TDNN, build_model
from asvspoof2021_air_tpu.parallel import make_mesh, shard_batch
from asvspoof2021_air_tpu.train.state import (
    create_train_state,
    make_backbone_optimizer,
    make_loss_optimizer,
    step_decay_schedule,
)
from asvspoof2021_air_tpu.train.steps import StepConfig, make_eval_step, make_train_step

B, T, F, ENC = 16, 100, 60, 32


def tiny_model():
    return ECAPA_TDNN(C=32, model_scale=4, n_out=2, n_feat=F, enc_dim=ENC)


def make_batch(seed=0):
    g = np.random.default_rng(seed)
    labels = g.integers(0, 2, B)
    feats = g.standard_normal((B, T, F)).astype(np.float32)
    # separable signal so training can reduce the loss
    feats += labels[:, None, None] * 2.0
    return {
        "feat": feats,
        "label": labels.astype(np.int32),
        "channel": g.integers(0, 5, B).astype(np.int32),
    }


def build_setup(add_loss="ang_iso", adv=False):
    model = tiny_model()
    loss_mod = build_loss(add_loss, enc_dim=ENC) if add_loss else None
    sched = step_decay_schedule(5e-4, 0.5, 30, steps_per_epoch=10)
    btx = make_backbone_optimizer(sched)
    ltx = make_loss_optimizer(sched) if loss_mod else None
    clf = ChannelClassifier(enc_dim=ENC, nclasses=5, lambda_=0.05) if adv else None
    ctx = make_backbone_optimizer(lambda _: 1e-4) if adv else None

    rng = jax.random.PRNGKey(688)
    example = jnp.zeros((B, T, F), jnp.float32)
    state = create_train_state(
        rng, model, example,
        loss_module=loss_mod,
        example_feat=jnp.zeros((B, ENC)),
        example_labels=jnp.zeros((B,), jnp.int32),
        backbone_tx=btx, loss_tx=ltx,
        classifier=clf, classifier_tx=ctx,
    )
    cfg = StepConfig(add_loss=add_loss, adv_aug=adv)
    train_step = make_train_step(model, loss_mod, btx, ltx, cfg,
                                 classifier=clf, classifier_tx=ctx)
    eval_step = make_eval_step(model, loss_mod, cfg)
    return state, train_step, eval_step


def test_schedule_decay():
    sched = step_decay_schedule(1.0, 0.5, 30, steps_per_epoch=10)
    assert sched(0) == 1.0
    assert sched(299) == 1.0          # epoch 29
    assert sched(300) == 0.5          # epoch 30
    assert sched(600) == 0.25         # epoch 60


@pytest.mark.parametrize("add_loss", [None, "ang_iso", "isolate", "p2sgrad"])
def test_train_step_reduces_loss(add_loss):
    state, train_step, eval_step = build_setup(add_loss)
    step = jax.jit(train_step)
    batch = make_batch()
    rng = jax.random.PRNGKey(0)

    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["total_loss"]))
    assert state.step == 8
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    metrics, scores, feats = jax.jit(eval_step)(state, batch)
    assert scores.shape == (B,)
    assert feats.shape == (B, ENC)


def test_train_step_adv_aug():
    state, train_step, eval_step = build_setup("ang_iso", adv=True)
    step = jax.jit(train_step)
    batch = make_batch()
    state, m0 = step(state, batch, jax.random.PRNGKey(1), 0.0)
    state, m1 = step(state, batch, jax.random.PRNGKey(2), 1.0)
    assert "adv_loss" in m1 and "clf_loss" in m1
    assert np.isfinite(float(m1["adv_loss"]))
    # classifier params must move
    assert state.clf_params is not None


def test_train_step_on_mesh():
    mesh = make_mesh()
    assert len(mesh.devices.ravel()) == 8, "expected 8 virtual CPU devices"
    state, train_step, eval_step = build_setup("ang_iso")
    batch = shard_batch(make_batch(), mesh)
    step = jax.jit(train_step)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
    # params stay replicated; batch was sharded across 8 devices
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.sharding.device_set) in (1, 8)


def test_bce_base_loss():
    model = tiny_model()
    sched = step_decay_schedule(5e-4, 0.5, 30, 10)
    btx = make_backbone_optimizer(sched)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(rng, model, jnp.zeros((B, T, F)), backbone_tx=btx)
    cfg = StepConfig(add_loss=None, base_loss="bce")
    # bce scores come from raw logits[:, 0] (main_train.py:527-528)
    eval_step = jax.jit(make_eval_step(model, None, cfg))
    metrics, scores, _ = eval_step(state, make_batch())
    assert np.isfinite(float(metrics["base_loss"]))
    assert scores.shape == (B,)


def test_remat_policy_matches_default_trajectory():
    """StepConfig(remat_policy='conv_dot') saves only conv/dot outputs
    and recomputes the elementwise chains in the backward — a memory
    knob, not a semantic one: a short trajectory must match the default
    step to float tolerance. (Throughput on the flagship graph measured
    SLOWER either way — docs/PERFORMANCE.md records both remat
    negatives; the knob exists for memory-constrained configs.)"""
    model = tiny_model()
    loss_mod = build_loss("ang_iso", enc_dim=ENC)
    btx = make_backbone_optimizer(lambda _: 5e-4)
    ltx = make_loss_optimizer(lambda _: 5e-4)
    rng = jax.random.PRNGKey(3)
    example = jnp.zeros((B, T, F), jnp.float32)

    def run(policy):
        state = create_train_state(
            rng, model, example,
            loss_module=loss_mod,
            example_feat=jnp.zeros((B, ENC)),
            example_labels=jnp.zeros((B,), jnp.int32),
            backbone_tx=btx, loss_tx=ltx,
        )
        cfg = StepConfig(add_loss="ang_iso", remat_policy=policy)
        step = jax.jit(make_train_step(model, loss_mod, btx, ltx, cfg))
        losses = []
        for i in range(3):
            state, m = step(state, make_batch(i), jax.random.PRNGKey(9))
            losses.append(float(m["total_loss"]))
        return losses, state

    base_losses, base_state = run(None)
    remat_losses, remat_state = run("conv_dot")
    np.testing.assert_allclose(remat_losses, base_losses, rtol=1e-5)
    a = jax.tree_util.tree_leaves(base_state.params)
    b = jax.tree_util.tree_leaves(remat_state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-5, rtol=1e-4)


def test_remat_policy_rejects_unknown_value():
    model = tiny_model()
    with pytest.raises(ValueError):
        make_train_step(model, None, make_backbone_optimizer(lambda _: 1e-3),
                        None, StepConfig(remat_policy="everything"))


def test_multi_step_equals_sequential_steps():
    """make_multi_step(K) trains the same as K single calls (per-step keys
    derive from state.step inside the step); tolerances cover f32 fusion
    differences between the scanned body and the standalone jit."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from asvspoof2021_air_tpu.losses import build_loss
    from asvspoof2021_air_tpu.models import build_model
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

    K, B, T, D = 3, 8, 24, 60
    model = build_model("lcnn", enc_dim=16, nclasses=2, feat_dim=D, feat_len=T)
    loss_mod = build_loss("ang_iso", enc_dim=16)
    sched = step_decay_schedule(5e-4, 0.5, 30, 10)
    btx, ltx = make_backbone_optimizer(sched), make_loss_optimizer(sched)
    rng = jax.random.PRNGKey(0)
    g = np.random.default_rng(0)
    feats = jnp.asarray(g.standard_normal((K, B, T, D)), jnp.float32)
    labels = jnp.asarray((np.arange(K * B) % 2).reshape(K, B), jnp.int32)

    def fresh_state():
        return create_train_state(
            rng, model, feats[0], loss_module=loss_mod,
            example_feat=jnp.zeros((B, 16)), example_labels=labels[0],
            backbone_tx=btx, loss_tx=ltx,
        )

    step = make_train_step(model, loss_mod, btx, ltx,
                           StepConfig(add_loss="ang_iso"))
    base = jax.random.PRNGKey(7)

    s_seq = fresh_state()
    seq_metrics = []
    for j in range(K):
        s_seq, m = jax.jit(step)(
            s_seq, {"feat": feats[j], "label": labels[j]}, base)
        seq_metrics.append(float(m["total_loss"]))

    s_multi, mm = jax.jit(make_multi_step(step, K))(
        fresh_state(), {"feat": feats, "label": labels}, base)

    np.testing.assert_allclose(
        np.asarray(mm["total_loss"]), np.asarray(seq_metrics), rtol=2e-4)
    # Adam normalizes near-zero grads, so f32 accumulation-order noise can
    # flip individual updates by up to lr; bound drift by the K-step update
    # scale (K * lr = 1.5e-3) elementwise and much tighter on average.
    def close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=2e-3)
        assert np.abs(a - b).mean() < 1e-4

    jax.tree.map(close, s_seq.params, s_multi.params)
    assert int(s_multi.step) == K
