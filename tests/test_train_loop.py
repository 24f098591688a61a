"""End-to-end training-driver smoke test on synthetic features."""

import os

import numpy as np
import pytest

from asvspoof2021_air_tpu.train.loop import TrainConfig, train

D = 60


class SyntheticDataset:
    """Separable two-class features with reference item layout
    (feat, fname, tag, label, channel)."""

    def __init__(self, n=24, t=120, seed=0):
        self.n = n
        self.t = t
        self.g = np.random.default_rng(seed)
        self.labels = (np.arange(n) % 2).astype(np.int32)
        self.feats = [
            (self.g.standard_normal((1, t, D)) + 1.5 * l).astype(np.float32)
            for l in self.labels
        ]
        self.num_original = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.feats[i], f"SYN_{i:04d}", 0, int(self.labels[i]), 0


@pytest.mark.parametrize("add_loss", ["ang_iso"])
def test_train_loop_end_to_end(tmp_path, add_loss):
    cfg = TrainConfig(
        out_fold=str(tmp_path / "out"),
        model="lcnn",
        add_loss=add_loss,
        num_epochs=2,
        batch_size=8,
        feat_len=112,
        feat_dim=D,
        ratio=1.0,
        enc_dim=32,
    )
    train_set = SyntheticDataset(seed=0)
    dev_set = SyntheticDataset(seed=1)
    summary = train(cfg, train_set=train_set, dev_set=dev_set)

    assert summary["epochs"] == 2
    assert np.isfinite(summary["dev_loss"])
    assert 0.0 <= summary["dev_eer"] <= 0.5
    out = cfg.out_fold
    assert os.path.exists(os.path.join(out, "args.json"))
    assert os.path.getsize(os.path.join(out, "train_loss.log")) > 0
    assert os.path.getsize(os.path.join(out, "dev_loss.log")) > 0
    # per-epoch + best checkpoints
    assert any(os.scandir(os.path.join(out, "checkpoint")))
    assert os.path.exists(os.path.join(out, "best")) or any(
        f.startswith("best") for f in os.listdir(out)
    )


def test_train_loop_resume(tmp_path):
    cfg = TrainConfig(
        out_fold=str(tmp_path / "out"),
        model="lcnn",
        add_loss="ang_iso",
        num_epochs=1,
        batch_size=8,
        feat_len=112,
        feat_dim=D,
        ratio=1.0,
        enc_dim=32,
    )
    train_set = SyntheticDataset(seed=0)
    dev_set = SyntheticDataset(seed=1)
    s1 = train(cfg, train_set=train_set, dev_set=dev_set)
    cfg2 = TrainConfig(**{**cfg.__dict__, "continue_training": True, "num_epochs": 1})
    s2 = train(cfg2, train_set=train_set, dev_set=dev_set)
    assert s2["epochs"] == 1


class SyntheticRawDataset:
    """Raw-audio items (wav, fname, tag, label) with separable classes."""

    def __init__(self, n=16, seed=0, base_len=9000):
        self.n = n
        g = np.random.default_rng(seed)
        self.items = []
        for i in range(n):
            label = i % 2
            l = base_len + 321 * i
            wav = 0.2 * g.standard_normal(l)
            if label:
                t = np.arange(l) / 16000.0
                wav = 0.15 * np.sin(2 * np.pi * 700 * t) + 0.05 * g.standard_normal(l)
            self.items.append((wav.astype(np.float32), f"R{i:04d}", 0, label))
        self.num_original = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.items[i]


def test_train_loop_on_the_fly(tmp_path):
    """Raw waveforms in, on-device augmentation + LFCC inside the step."""
    cfg = TrainConfig(
        out_fold=str(tmp_path / "otf"),
        model="lcnn",
        add_loss="ang_iso",
        num_epochs=2,
        batch_size=8,
        feat_len=64,
        feat_dim=D,
        ratio=1.0,
        enc_dim=32,
        on_the_fly=True,
        on_device_aug=True,
    )
    summary = train(cfg, train_set=SyntheticRawDataset(seed=0),
                    dev_set=SyntheticRawDataset(seed=1))
    assert summary["epochs"] == 2
    assert np.isfinite(summary["dev_loss"])
    assert summary["dev_eer"] <= 0.5


class SyntheticAugDataset(SyntheticDataset):
    """Feature items with nonzero channel labels for the second half."""

    def __init__(self, n=24, t=120, seed=0, n_channels=5):
        super().__init__(n, t, seed)
        self.num_original = n // 2
        self.channels = (np.arange(n) % n_channels).astype(np.int32)
        self.channel = [f"ch{i}" for i in range(n_channels)]

    def __getitem__(self, i):
        return (self.feats[i], f"SYN_{i:04d}", 0, int(self.labels[i]),
                int(self.channels[i]))


def test_train_loop_adv_aug(tmp_path):
    """ADV_AUG end-to-end: ratio mixing + GRL channel classifier phases."""
    cfg = TrainConfig(
        out_fold=str(tmp_path / "adv"),
        model="lcnn",
        add_loss="ang_iso",
        num_epochs=2,
        batch_size=8,
        feat_len=112,
        feat_dim=D,
        ratio=0.5,
        enc_dim=32,
        ADV_AUG=True,
        LA_aug=True,
    )
    train_set = SyntheticAugDataset(seed=0)
    dev_set = SyntheticAugDataset(seed=1)
    summary = train(cfg, train_set=train_set, dev_set=dev_set)
    assert summary["epochs"] == 2
    assert np.isfinite(summary["dev_loss"])


def test_train_loop_visualize(tmp_path):
    pytest.importorskip("sklearn")
    cfg = TrainConfig(
        out_fold=str(tmp_path / "vis"),
        model="lcnn",
        add_loss="ang_iso",
        num_epochs=1,
        batch_size=8,
        feat_len=112,
        feat_dim=D,
        ratio=1.0,
        enc_dim=32,
        visualize=True,
    )
    summary = train(cfg, train_set=SyntheticDataset(seed=0),
                    dev_set=SyntheticDataset(seed=1))
    import os
    assert any(f.startswith("embedding_vis") for f in os.listdir(cfg.out_fold))


def test_train_loop_auto_resume(tmp_path):
    """Preemption recovery: restart picks up from the latest epoch."""
    cfg = TrainConfig(
        out_fold=str(tmp_path / "ar"),
        model="lcnn",
        add_loss="ang_iso",
        num_epochs=2,
        batch_size=8,
        feat_len=112,
        feat_dim=D,
        ratio=1.0,
        enc_dim=32,
        auto_resume=True,
    )
    train_set = SyntheticDataset(seed=0)
    dev_set = SyntheticDataset(seed=1)
    s1 = train(cfg, train_set=train_set, dev_set=dev_set)
    assert s1["epochs"] == 2
    # "preempted" restart with more epochs: resumes at epoch 2
    cfg2 = TrainConfig(**{**cfg.__dict__, "num_epochs": 3})
    s2 = train(cfg2, train_set=train_set, dev_set=dev_set)
    assert s2["epochs"] == 3  # only epoch index 2 was run this time
    import os
    assert sorted(os.listdir(os.path.join(cfg.out_fold, "checkpoint"))) == [
        "1", "2", "3"
    ]


def test_auto_resume_preserves_best_dev_loss(tmp_path):
    """The first post-resume epoch must not overwrite <out>/best when its dev
    loss is worse than the historical best (best_dev_loss + early_stop are
    persisted in train_meta.json and restored on auto-resume)."""
    import json

    cfg = TrainConfig(
        out_fold=str(tmp_path / "arm"),
        model="lcnn",
        add_loss="ang_iso",
        num_epochs=1,
        batch_size=8,
        feat_len=112,
        feat_dim=D,
        ratio=1.0,
        enc_dim=32,
        auto_resume=True,
    )
    train_set = SyntheticDataset(seed=0)
    dev_set = SyntheticDataset(seed=1)
    s1 = train(cfg, train_set=train_set, dev_set=dev_set)
    meta_path = os.path.join(cfg.out_fold, "train_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["best_dev_loss"] == s1["best_dev_loss"]

    # Simulate a historical best far better than anything epoch 2 will reach:
    # 'best' must NOT be overwritten after resuming.
    fake_best = 1e-9
    with open(meta_path, "w") as f:
        json.dump({**meta, "best_dev_loss": fake_best, "early_stop": 3}, f)
    best_mtime = os.path.getmtime(
        os.path.join(cfg.out_fold, "best", "_CHECKPOINT_METADATA")
    ) if os.path.exists(
        os.path.join(cfg.out_fold, "best", "_CHECKPOINT_METADATA")
    ) else max(
        os.path.getmtime(os.path.join(cfg.out_fold, "best", p))
        for p in os.listdir(os.path.join(cfg.out_fold, "best"))
    )
    cfg2 = TrainConfig(**{**cfg.__dict__, "num_epochs": 2})
    s2 = train(cfg2, train_set=train_set, dev_set=dev_set)
    assert s2["best_dev_loss"] == fake_best
    new_mtime = max(
        os.path.getmtime(os.path.join(cfg.out_fold, "best", p))
        for p in os.listdir(os.path.join(cfg.out_fold, "best"))
    )
    assert new_mtime == best_mtime  # best checkpoint untouched
    with open(meta_path) as f:
        meta2 = json.load(f)
    assert meta2["early_stop"] == 4  # counter continued, not reset


def test_visualize_uses_eval_embeddings(tmp_path):
    """With test_on_eval + visualize, the 2x2 plot gets dev AND eval
    embedding sets (reference visualize.py:67-89), not dev twice."""
    pytest.importorskip("sklearn")
    captured = {}
    import asvspoof2021_air_tpu.visualize as vis

    orig = vis.visualize_dev_and_eval

    def spy(dev_feats, dev_labels, eval_feats, eval_labels, center, **kw):
        captured["dev"] = np.asarray(dev_feats)
        captured["eval"] = np.asarray(eval_feats)
        return orig(dev_feats, dev_labels, eval_feats, eval_labels, center, **kw)

    vis.visualize_dev_and_eval = spy
    try:
        cfg = TrainConfig(
            out_fold=str(tmp_path / "vise"),
            model="lcnn",
            add_loss="ang_iso",
            num_epochs=1,
            batch_size=8,
            feat_len=64,
            feat_dim=D,
            ratio=1.0,
            enc_dim=32,
            on_the_fly=True,
            test_on_eval=True,
            visualize=True,
        )
        train(cfg, train_set=SyntheticRawDataset(seed=0),
              dev_set=SyntheticRawDataset(seed=1),
              eval_set=SyntheticRawDataset(n=10, seed=2))
    finally:
        vis.visualize_dev_and_eval = orig
    assert captured["eval"].shape[0] == 10  # the eval set, trimmed to count
    assert captured["dev"].shape != captured["eval"].shape or not np.allclose(
        captured["dev"], captured["eval"]
    )


def test_train_loop_on_the_fly_test_on_eval(tmp_path):
    """test_on_eval over raw audio in on-the-fly mode."""
    cfg = TrainConfig(
        out_fold=str(tmp_path / "otfe"),
        model="lcnn",
        add_loss="ang_iso",
        num_epochs=1,
        batch_size=8,
        feat_len=64,
        feat_dim=D,
        ratio=1.0,
        enc_dim=32,
        on_the_fly=True,
        test_on_eval=True,
    )
    summary = train(cfg, train_set=SyntheticRawDataset(seed=0),
                    dev_set=SyntheticRawDataset(seed=1),
                    eval_set=SyntheticRawDataset(n=10, seed=2))
    import os
    log = open(os.path.join(cfg.out_fold, "test_loss.log")).read()
    assert len(log.strip().splitlines()) >= 2  # header + 1 epoch line


def test_train_loop_steps_per_call(tmp_path):
    """steps_per_call > 1 (scanned multi-step dispatch) trains end-to-end
    with per-step logging intact, including a non-divisible epoch tail."""
    cfg = TrainConfig(
        out_fold=str(tmp_path / "spc"),
        model="lcnn",
        add_loss="ang_iso",
        num_epochs=2,
        batch_size=8,
        feat_len=112,
        feat_dim=D,
        ratio=1.0,
        enc_dim=32,
        steps_per_call=2,
    )
    train_set = SyntheticDataset(n=24, seed=0)  # 3 steps/epoch: 2 + tail 1
    dev_set = SyntheticDataset(n=24, seed=1)
    summary = train(cfg, train_set=train_set, dev_set=dev_set)
    assert summary["epochs"] == 2
    assert np.isfinite(summary["dev_loss"])
    lines = [ln for ln in open(os.path.join(cfg.out_fold, "train_loss.log"))
             if "\t" in ln]
    assert len(lines) == 2 * 3  # one log line per optimizer step
    steps = [int(ln.split("\t")[1]) for ln in lines]
    assert steps == [0, 1, 2, 0, 1, 2]


def test_train_loop_profile_flag(tmp_path):
    cfg = TrainConfig(
        out_fold=str(tmp_path / "prof"),
        model="lcnn",
        add_loss="ang_iso",
        num_epochs=1,
        batch_size=8,
        feat_len=112,
        feat_dim=D,
        ratio=1.0,
        enc_dim=32,
        profile=True,
    )
    train(cfg, train_set=SyntheticDataset(seed=0),
          dev_set=SyntheticDataset(seed=1))
    prof_dir = os.path.join(cfg.out_fold, "profile")
    assert os.path.isdir(prof_dir)
    files = [os.path.join(dp, f) for dp, _d, fs in os.walk(prof_dir) for f in fs]
    assert files  # trace artifacts written


def test_train_loop_rawnet_on_the_fly(tmp_path):
    """RawNet2 trains end-to-end from raw waveforms (the reference ships the
    model but never wires it into training, /root/reference/model.py:642-893;
    here --on_the_fly feeds tiled waveforms straight to the model)."""
    tiny = {
        "nb_samp": 6400, "first_conv": 129, "in_channels": 1,
        "filts": [4, [4, 4], [4, 8], [8, 8]], "blocks": [2, 4],
        "nb_fc_node": 16, "gru_node": 16, "nb_gru_layer": 1, "nb_classes": 2,
    }
    cfg = TrainConfig(
        out_fold=str(tmp_path / "rawnet"),
        model="rawnet",
        add_loss=None,
        num_epochs=2,
        batch_size=8,
        ratio=1.0,
        on_the_fly=True,
        on_device_aug=True,
        rawnet_args=tiny,
    )
    summary = train(cfg, train_set=SyntheticRawDataset(seed=0, base_len=6000),
                    dev_set=SyntheticRawDataset(seed=1, base_len=6000))
    assert summary["epochs"] == 2
    assert np.isfinite(summary["dev_loss"])
    assert 0.0 <= summary["dev_eer"] <= 0.5


def test_rawnet_rejects_add_loss(tmp_path):
    cfg = TrainConfig(out_fold=str(tmp_path / "x"), model="rawnet",
                      add_loss="ang_iso", on_the_fly=True, batch_size=8)
    with pytest.raises(ValueError, match="base CE"):
        train(cfg, train_set=SyntheticRawDataset(seed=0),
              dev_set=SyntheticRawDataset(seed=1))


def test_dev_aug_monitoring_variant(tmp_path):
    import dataclasses

    """--dev_aug builds a separate dev-monitoring eval step that applies
    the on-device augmenter with deterministic draws; the public eval step
    (scoring/test_on_eval) stays clean."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from asvspoof2021_air_tpu.ops.augment import (
        ChannelAugmenter,
        synthetic_ir_bank,
    )
    from asvspoof2021_air_tpu.train.frontend import OnDeviceFrontend
    from asvspoof2021_air_tpu.train.loop import TrainConfig, setup_training

    fe = OnDeviceFrontend(
        feat_len=40, padding="repeat",
        augmenter=ChannelAugmenter(ir_bank=synthetic_ir_bank(2, 64),
                                   n_fft=8192),
        apply_ir=False, use_pallas=False,
    )
    config = TrainConfig(
        out_fold=str(tmp_path / "r"), model="lcnn", add_loss="ang_iso",
        batch_size=4, feat_len=40, enc_dim=16,
        on_the_fly=True, on_device_aug=True, dev_aug=True,
    )
    _m, _l, state, _ts, eval_step = setup_training(
        config, steps_per_epoch=2, frontend=fe
    )
    dev_step = eval_step.dev_eval_step
    assert dev_step is not eval_step

    g = np.random.default_rng(0)
    n = fe.min_samples()
    batch = {
        "wave": jnp.asarray(g.standard_normal((4, n)), jnp.float32),
        "length": jnp.full((4,), n, jnp.int32),
        "label": jnp.asarray([0, 1, 0, 1], jnp.int32),
    }
    m1, s1, _ = dev_step(state, batch, fe.params)
    m2, s2, _ = dev_step(state, batch, fe.params)
    mc, sc, _ = eval_step(state, batch, fe.params)
    # deterministic draws: identical across calls (= across epochs)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    # and genuinely augmented: differs from the clean eval view
    assert not np.allclose(np.asarray(s1), np.asarray(sc))

    # without the flag the attribute is the clean step itself
    config2 = dataclasses.replace(config, dev_aug=False,
                                  out_fold=str(tmp_path / "r2"))
    _m, _l, _s, _ts, ev2 = setup_training(config2, steps_per_epoch=2,
                                          frontend=fe)
    assert ev2.dev_eval_step is ev2

    # ensembles must keep the clean dev step too when dev_aug is off
    # (regression: the identity check used to run after the ensemble wrap,
    # silently re-wrapping the dev step with the augmenting frontend)
    config3 = dataclasses.replace(config, dev_aug=False, ensemble=2,
                                  out_fold=str(tmp_path / "r3"))
    _m, _l, _s, _ts, ev3 = setup_training(config3, steps_per_epoch=2,
                                          frontend=fe)
    assert ev3.dev_eval_step is ev3
