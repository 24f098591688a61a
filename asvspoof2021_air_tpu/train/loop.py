"""Epoch-level training driver.

The TPU-native equivalent of the reference train() entry
(/root/reference/main_train.py:157-720): dataset construction per aug flags,
dual-optimizer setup, ratio-mixed epochs, per-step loss logging, per-epoch
validation with add-loss-specific scoring, dev-loss model selection,
per-epoch + best checkpoints, optional eval-set EER, early stopping.

Differences by design (TPU-first):
- one fused jitted step; batches are sharded over the data mesh
- full-size static batches (ragged tails fold into the stream wraparound)
- checkpoints are structured pytrees (Orbax), not pickled modules
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.data.datasets import (
    ASVspoof2019FeatureDataset,
    AugmentedFeatureDataset,
)
from asvspoof2021_air_tpu.data.pipeline import RatioMixIterator, SequentialIterator
from asvspoof2021_air_tpu.data.prefetch import PrefetchIterator
from asvspoof2021_air_tpu.losses import build_loss
from asvspoof2021_air_tpu.metrics import compute_eer
from asvspoof2021_air_tpu.models import ChannelClassifier, build_model
from asvspoof2021_air_tpu.parallel import make_mesh, shard_batch
from asvspoof2021_air_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from asvspoof2021_air_tpu.train.state import (
    create_train_state,
    make_backbone_optimizer,
    make_loss_optimizer,
    step_decay_schedule,
)
from asvspoof2021_air_tpu.train.steps import StepConfig, make_eval_step, make_train_step
from asvspoof2021_air_tpu.utils import setup_seed


@dataclasses.dataclass
class TrainConfig:
    """Flag-for-flag coverage of the reference training CLI
    (/root/reference/main_train.py:24-95)."""

    out_fold: str = "./models/try"
    seed: int = 688
    access_type: str = "LA"
    path_to_database: str = ""
    path_to_features: str = ""
    path_to_aug_features: str = ""
    ratio: float = 0.5
    feat: str = "LFCC"
    feat_len: int = 750
    feat_dim: int = 60
    pad_chop: bool = True
    padding: str = "repeat"
    enc_dim: int = 256
    model: str = "lcnn"
    num_epochs: int = 200
    batch_size: int = 64
    lr: float = 5e-4
    lr_decay: float = 0.5
    interval: int = 30
    beta_1: float = 0.9
    beta_2: float = 0.999
    eps: float = 1e-8
    base_loss: str = "ce"
    add_loss: Optional[str] = None
    weight_loss: float = 1.0
    r_real: float = 0.9
    r_fake: float = 0.2
    alpha: float = 20.0
    num_centers: int = 3
    test_only: bool = False
    continue_training: bool = False
    ADV_AUG: bool = False
    LA_aug: bool = False
    DF_aug: bool = False
    LAPA_aug: bool = False
    DFPA_aug: bool = False
    lambda_: float = 0.05
    lr_d: float = 1e-4
    test_on_eval: bool = False
    visualize: bool = False
    early_stop_patience: int = 500
    nclasses: int = 2
    compute_dtype: str = "float32"   # "bfloat16": MXU-native compute, f32 params
    # ECAPA attentive pooling through the differentiable Pallas kernel
    # (ops/attn_pool_vjp): same math and parameter tree, ~3% faster train
    # steps on TPU (docs/PERFORMANCE.md). auto = on for TPU backends, off on
    # CPU; on = force (interpret-mode Pallas on CPU, slow but exact).
    fused_pool: str = "auto"         # auto | on | off
    # relu<->batchnorm pairs (ECAPA post-activation, ResNet/Res2Net
    # pre-activation) through the recompute-VJP (ops/bn_relu_vjp):
    # identical math/tree, lighter train-mode autodiff residuals — A/B'd
    # with fused_pool at 23.4 -> 22.4 ms/step combined on v5e
    # (docs/PERFORMANCE.md "Fused-kernel A/B"). auto = on for TPU.
    fused_bn: str = "auto"           # auto | on | off
    # On-the-fly mode: raw waveforms in, augmentation + LFCC fused into the
    # jitted step (no feature cache at all) — the TPU-native fast path.
    on_the_fly: bool = False
    on_device_aug: bool = False      # per-utterance random channel each step
    dev_aug: bool = False            # on-the-fly: fixed-draw augmented dev
                                     # monitoring (mirrors the reference's
                                     # mixed-dev selection, main_train.py:489)
    apply_ir: bool = False           # + random impulse response from the bank
    # Fault tolerance: resume from the latest epoch checkpoint in out_fold
    # if one exists (preemption recovery; the reference has no equivalent).
    auto_resume: bool = False
    # Scan this many optimizer steps per device dispatch (amortizes per-call
    # dispatch latency; semantically identical — per-step keys derive from
    # state.step). 1 = reference-style one dispatch per step.
    steps_per_call: int = 1
    # RawNet2 hyperparameters (None = the ASVspoof2021 baseline config);
    # rawnet trains from raw waveforms via --on_the_fly.
    rawnet_args: Optional[dict] = None
    # Capture a jax.profiler trace of the first ~20 steps into
    # <out_fold>/profile (viewable in XProf/TensorBoard).
    profile: bool = False
    # Train N independently-initialized systems in one vmapped step and fuse
    # their dev/eval scores by averaging — the reference's 3-system avg_fuse
    # workflow (/root/reference/score_fusion.py:21-28) as a first-class
    # ensemble axis instead of N serial training jobs (train/ensemble.py).
    ensemble: int = 1


def _fused_host_scores(score) -> np.ndarray:
    """Eval-step scores to host: ensemble steps return a (n_members, B)
    member axis, fused by averaging (train/ensemble.fuse_scores); single
    systems return (B,) untouched."""
    sc = np.asarray(score)
    if sc.ndim == 2:
        from asvspoof2021_air_tpu.train.ensemble import fuse_scores

        return fuse_scores(sc)
    return sc


def _prepare_out_fold(config: TrainConfig) -> None:
    """(/root/reference/main_train.py:106-136)"""
    if config.test_only or config.continue_training:
        return
    if config.auto_resume and os.path.isdir(
        os.path.join(config.out_fold, "checkpoint")
    ):
        return  # resuming: keep existing logs and checkpoints
    for d in (config.out_fold, os.path.join(config.out_fold, "checkpoint")):
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(d)
    with open(os.path.join(config.out_fold, "args.json"), "w") as f:
        json.dump(dataclasses.asdict(config), f, indent=2, sort_keys=True)
    for name in ("train_loss.log", "dev_loss.log", "test_loss.log"):
        with open(os.path.join(config.out_fold, name), "w") as f:
            f.write(f"Start recording {name.split('_')[0]} loss ...\n")


def build_datasets(config: TrainConfig):
    """Dataset selection per aug flags (/root/reference/main_train.py:178-209)."""
    if config.on_the_fly:
        from asvspoof2021_air_tpu.data.datasets import RawAudioDataset

        train_set = RawAudioDataset(
            config.access_type, config.path_to_database, "train"
        )
        dev_set = RawAudioDataset(config.access_type, config.path_to_database, "dev")
        return train_set, dev_set
    if config.LA_aug or config.DF_aug or config.LAPA_aug or config.DFPA_aug:
        variant = "LA" if (config.LA_aug or config.LAPA_aug) else "DF"
        with_device = config.LAPA_aug or config.DFPA_aug
        train_set = AugmentedFeatureDataset(
            config.path_to_features, config.path_to_aug_features, "train",
            config.feat, variant, with_device,
        )
        dev_set = AugmentedFeatureDataset(
            config.path_to_features, config.path_to_aug_features, "dev",
            config.feat, variant, with_device,
        )
    else:
        train_set = ASVspoof2019FeatureDataset(
            config.access_type, config.path_to_features, "train", config.feat
        )
        dev_set = ASVspoof2019FeatureDataset(
            config.access_type, config.path_to_features, "dev", config.feat
        )
    return train_set, dev_set


def setup_training(config: TrainConfig, steps_per_epoch: int, frontend=None):
    """Build model, loss, optimizers, state, and jitted steps."""
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else None
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    use_fused = config.fused_pool == "on" or (
        config.fused_pool == "auto" and on_tpu)
    model = build_model(
        config.model, enc_dim=config.enc_dim,
        nclasses=1 if config.base_loss == "bce" else config.nclasses,
        feat_dim=config.feat_dim, feat_len=config.feat_len, dtype=dtype,
        rawnet_args=config.rawnet_args,
        fused_pool=use_fused, pool_interpret=use_fused and not on_tpu,
        fused_bn=config.fused_bn == "on" or (
            config.fused_bn == "auto" and on_tpu),
    )
    if config.model == "rawnet" and config.add_loss is not None:
        raise ValueError(
            "rawnet returns class logits, not an enc_dim embedding; train it "
            "with the base CE loss (add_loss None)"
        )
    loss_mod = build_loss(
        config.add_loss, enc_dim=config.enc_dim, r_real=config.r_real,
        r_fake=config.r_fake, alpha=config.alpha, nclasses=config.nclasses,
    )
    sched = step_decay_schedule(config.lr, config.lr_decay, config.interval,
                                steps_per_epoch)
    sched_d = step_decay_schedule(config.lr_d, config.lr_decay, config.interval,
                                  steps_per_epoch)
    btx = make_backbone_optimizer(sched, config.beta_1, config.beta_2, config.eps)
    ltx = make_loss_optimizer(sched) if loss_mod is not None else None

    classifier = classifier2 = ctx = None
    dual = False
    if config.ADV_AUG:
        if not (config.LA_aug or config.DF_aug or config.LAPA_aug or config.DFPA_aug):
            raise ValueError("ADV_AUG requires an augmentation flag")
        from asvspoof2021_air_tpu.data import protocol as proto

        dual = config.LAPA_aug or config.DFPA_aug
        n_channels = len(
            proto.LA_CHANNELS if (config.LA_aug or config.LAPA_aug)
            else proto.DF_CHANNELS
        )
        classifier = ChannelClassifier(config.enc_dim, n_channels, config.lambda_)
        ctx = make_backbone_optimizer(sched_d, config.beta_1, config.beta_2,
                                      config.eps)
        if dual:
            classifier2 = ChannelClassifier(
                config.enc_dim, len(proto.DEVICES), config.lambda_
            )

    rng = jax.random.PRNGKey(config.seed)
    if config.model == "rawnet":
        from asvspoof2021_air_tpu.models.rawnet import RAWNET2_DEFAULT_ARGS

        nb_samp = (config.rawnet_args or RAWNET2_DEFAULT_ARGS)["nb_samp"]
        example = jnp.zeros((config.batch_size, nb_samp), jnp.float32)
    else:
        example = jnp.zeros(
            (config.batch_size, config.feat_len, config.feat_dim), jnp.float32
        )
    def make_state(state_rng):
        return create_train_state(
            state_rng, model, example,
            loss_module=loss_mod,
            example_feat=jnp.zeros((config.batch_size, config.enc_dim)),
            example_labels=jnp.zeros((config.batch_size,), jnp.int32),
            backbone_tx=btx, loss_tx=ltx,
            classifier=classifier, classifier_tx=ctx, classifier2=classifier2,
        )

    step_cfg = StepConfig(
        add_loss=config.add_loss, base_loss=config.base_loss,
        weight_loss=config.weight_loss, adv_aug=config.ADV_AUG,
        dual_classifier=dual,
    )
    raw_train_step = make_train_step(
        model, loss_mod, btx, ltx, step_cfg,
        classifier=classifier, classifier_tx=ctx, classifier2=classifier2,
        frontend=frontend,
    )
    # Evaluation/scoring runs clean (the reference tests on unaugmented
    # features, /root/reference/main_train.py:616-668) — the eval step gets
    # an augmenter-free view of the front-end. Dev-loss MONITORING with
    # --dev_aug additionally gets an augmented variant with deterministic
    # draws (the eval step always passes a fixed key, so every epoch sees
    # the same augmented dev set — the on-the-fly analog of the
    # reference's mixed valOri+valAug monitoring, main_train.py:489-577).
    eval_frontend = (
        frontend.eval_view() if hasattr(frontend, "eval_view") else frontend
    )
    raw_eval_step = make_eval_step(model, loss_mod, step_cfg,
                                   frontend=eval_frontend)
    raw_dev_eval_step = raw_eval_step
    if config.dev_aug and config.on_device_aug and frontend is not None:
        raw_dev_eval_step = make_eval_step(model, loss_mod, step_cfg,
                                           frontend=frontend)

    if config.ensemble > 1:
        from asvspoof2021_air_tpu.train.ensemble import (
            init_ensemble_state,
            make_ensemble_eval_step,
            make_ensemble_train_step,
        )

        state = init_ensemble_state(make_state, rng, config.ensemble)
        raw_train_step = make_ensemble_train_step(raw_train_step,
                                                  config.ensemble,
                                                  frontend=frontend)
        dev_differs = raw_dev_eval_step is not raw_eval_step
        raw_eval_step = make_ensemble_eval_step(raw_eval_step,
                                                frontend=eval_frontend)
        if dev_differs:
            raw_dev_eval_step = make_ensemble_eval_step(raw_dev_eval_step,
                                                        frontend=frontend)
        else:
            raw_dev_eval_step = raw_eval_step
    else:
        state = make_state(rng)

    train_step = jax.jit(raw_train_step, donate_argnums=(0,))
    eval_step = jax.jit(raw_eval_step)
    # dev-monitoring variant rides along as an attribute so the public
    # 5-tuple (used by scoring/export) stays stable
    eval_step.dev_eval_step = (
        jax.jit(raw_dev_eval_step) if raw_dev_eval_step is not raw_eval_step
        else eval_step
    )
    return model, loss_mod, state, train_step, eval_step


def train(config: TrainConfig, train_set=None, dev_set=None, eval_set=None,
          mesh=None) -> Dict[str, Any]:
    """Run the full training loop; returns a summary dict."""
    setup_seed(config.seed)
    _prepare_out_fold(config)

    if train_set is None or dev_set is None:
        train_set, dev_set = build_datasets(config)
    if len(train_set) == 0 or len(dev_set) == 0:
        source = (config.path_to_database if config.on_the_fly
                  else config.path_to_features)
        raise FileNotFoundError(
            f"no data found under '{source}' "
            f"(train: {len(train_set)}, dev: {len(dev_set)}); expected "
            f"<path>/{{train,dev}}/{config.feat}/*.npy — "
            "run asvspoof2021_air_tpu.cli.preprocess first"
        )

    mesh = mesh or make_mesh()
    monitor = config.add_loss or "base_loss"

    frontend = None
    if config.on_the_fly:
        from asvspoof2021_air_tpu.data.pipeline import WaveformIterator
        from asvspoof2021_air_tpu.ops.augment import (
            ChannelAugmenter,
            synthetic_ir_bank,
        )
        from asvspoof2021_air_tpu.train.frontend import OnDeviceFrontend

        augmenter = None
        if config.on_device_aug:
            ir_bank = synthetic_ir_bank() if config.apply_ir else None
            augmenter = ChannelAugmenter(ir_bank=ir_bank)
        if config.model == "rawnet":
            # raw-waveform model: no spectral front-end, waveforms tiled to
            # the model's fixed sample count
            from asvspoof2021_air_tpu.models.rawnet import RAWNET2_DEFAULT_ARGS
            from asvspoof2021_air_tpu.train.frontend import WaveformFrontend

            nb_samp = (config.rawnet_args or RAWNET2_DEFAULT_ARGS)["nb_samp"]
            frontend = WaveformFrontend(
                n_samples=nb_samp, augmenter=augmenter,
                apply_ir=config.apply_ir,
            )
        else:
            frontend = OnDeviceFrontend(
                feat_len=config.feat_len, padding=config.padding,
                augmenter=augmenter, apply_ir=config.apply_ir,
                feature=config.feat,
            )
        max_samples = frontend.min_samples()
        train_iter = WaveformIterator(
            train_set, config.batch_size, max_samples, config.ratio,
            seed=config.seed,
        )
        dev_iter = WaveformIterator(
            dev_set, config.batch_size, max_samples, config.ratio,
            seed=config.seed + 1,
        )
    else:
        train_iter = RatioMixIterator(
            train_set, config.batch_size, config.ratio,
            feat_len=config.feat_len, padding=config.padding, seed=config.seed,
            pad_chop=config.pad_chop,
        )
        dev_iter = RatioMixIterator(
            dev_set, config.batch_size, config.ratio,
            feat_len=config.feat_len, padding=config.padding,
            seed=config.seed + 1, pad_chop=config.pad_chop,
        )

    train_iter = PrefetchIterator(train_iter, depth=2)
    dev_iter = PrefetchIterator(dev_iter, depth=2)

    model, loss_mod, state, train_step, eval_step = setup_training(
        config, train_iter.steps_per_epoch, frontend=frontend
    )
    multi_step = None
    if config.steps_per_call > 1:
        from asvspoof2021_air_tpu.train.steps import make_multi_step

        multi_step = jax.jit(
            make_multi_step(train_step, config.steps_per_call),
            donate_argnums=(0,),
        )
    start_epoch = 0
    prev_loss = 1e8
    early_stop = 0
    meta_path = os.path.join(config.out_fold, "train_meta.json")
    if config.continue_training:
        state = restore_checkpoint(os.path.join(config.out_fold, "best"), state)
    elif config.auto_resume:
        ckpt_dir = os.path.join(config.out_fold, "checkpoint")
        epochs = sorted(
            (int(d) for d in os.listdir(ckpt_dir) if d.isdigit()),
            reverse=True,
        ) if os.path.isdir(ckpt_dir) else []
        if epochs:
            state = restore_checkpoint(
                os.path.join(ckpt_dir, str(epochs[0])), state
            )
            start_epoch = epochs[0]
            # Restore model-selection history so the first post-resume epoch
            # cannot overwrite 'best' with a worse-than-historical dev loss.
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    meta = json.load(f)
                prev_loss = meta.get("best_dev_loss", prev_loss)
                early_stop = meta.get("early_stop", early_stop)

    rng = jax.random.PRNGKey(config.seed ^ 0x5EED)
    frontend_params = frontend.params if frontend is not None else None
    summary: Dict[str, Any] = {"epochs": 0}

    for epoch in range(start_epoch, config.num_epochs):
        # one device scalar per epoch (a python float would re-convert
        # host-side every step); the per-step key is folded inside the step
        adv_gate = jnp.float32(1.0 if (config.ADV_AUG and epoch > 0) else 0.0)
        t0 = time.time()
        train_log = defaultdict(list)
        log_path = os.path.join(config.out_fold, "train_loss.log")
        profile_ctx = None
        if config.profile and epoch == start_epoch:
            from asvspoof2021_air_tpu.utils.profiling import trace

            profile_ctx = trace(os.path.join(config.out_fold, "profile"))
            profile_ctx.__enter__()
        i = 0

        def record(metrics, n_inner):
            nonlocal i
            # one device->host transfer per metric per dispatch, one log-file
            # open per dispatch (not per inner step — the K-step scan exists
            # to amortize per-step host overhead)
            host = {k: np.atleast_1d(np.asarray(v)) for k, v in metrics.items()}
            with open(log_path, "a") as f:
                for j in range(n_inner):
                    for k, v in host.items():
                        train_log[k].append(float(v[j] if v.size > 1 else v[0]))
                    f.write(f"{epoch}\t{i}\t{train_log[monitor][-1]}\n")
                    i += 1
            if profile_ctx is not None and i >= 20:
                _close_profile()

        def _close_profile():
            nonlocal profile_ctx
            if profile_ctx is not None:
                jax.block_until_ready(state.step)
                profile_ctx.__exit__(None, None, None)
                profile_ctx = None

        K = max(1, config.steps_per_call)
        pending = []
        for batch in train_iter.epoch():
            batch = {k: v for k, v in batch.items() if k != "fname"}
            if K == 1:
                device_batch = shard_batch(batch, mesh)
                state, metrics = train_step(
                    state, device_batch, rng, adv_gate, frontend_params,
                )
                record(metrics, 1)
                continue
            pending.append(batch)
            if len(pending) < K:
                continue
            stacked = {
                k: np.stack([b[k] for b in pending]) for k in pending[0]
            }
            pending = []
            device_batch = shard_batch(stacked, mesh, batch_axis=1)
            state, metrics = multi_step(
                state, device_batch, rng, adv_gate, frontend_params,
            )
            record(metrics, K)
        for batch in pending:  # epoch tail shorter than steps_per_call
            device_batch = shard_batch(batch, mesh)
            state, metrics = train_step(
                state, device_batch, rng, adv_gate, frontend_params,
            )
            record(metrics, 1)
        _close_profile()

        # ---- validation (/root/reference/main_train.py:489-601) ----
        # --dev_aug monitors an augmented (fixed-draw) dev view; scoring
        # and test_on_eval below always run clean
        dev_step = getattr(eval_step, "dev_eval_step", eval_step)
        dev_log = defaultdict(list)
        scores, labels, dev_feats, dev_tags = [], [], [], []
        for batch in dev_iter.epoch():
            device_batch = shard_batch(
                {k: v for k, v in batch.items() if k != "fname"}, mesh
            )
            metrics, score, feats = dev_step(state, device_batch,
                                             frontend_params)
            for k, v in metrics.items():
                dev_log[k].append(float(v))
            scores.append(_fused_host_scores(score))
            labels.append(batch["label"])
            if config.visualize:
                dev_feats.append(np.asarray(feats))
                dev_tags.append(batch.get("tag", batch["label"]))
        scores = np.concatenate(scores)
        labels = np.concatenate(labels)
        eer = min(
            compute_eer(scores[labels == 0], scores[labels == 1])[0],
            compute_eer(-scores[labels == 0], -scores[labels == 1])[0],
        )
        val_loss = float(np.nanmean(dev_log[monitor]))
        with open(os.path.join(config.out_fold, "dev_loss.log"), "a") as f:
            f.write(f"{epoch}\t{val_loss}\t{eer}\n")

        # ---- optional eval-set EER (main_train.py:616-668) ----
        e_feats, e_label_chunks = [], []
        collect_eval_feats = config.visualize and (epoch + 1) % 3 == 1
        if config.test_on_eval and eval_set is not None:
            e_scores, e_labels = [], []
            if frontend is not None:
                # on-the-fly: sequential waveform batches; wraparound tail
                # items are trimmed by count
                from asvspoof2021_air_tpu.data.pipeline import WaveformIterator

                n_eval = len(eval_set)
                eval_it = WaveformIterator(
                    eval_set, config.batch_size, frontend.min_samples(),
                    ratio=1.0, shuffle=False,
                    steps_per_epoch=-(-n_eval // config.batch_size),
                )
                remaining = n_eval
                for batch in eval_it.epoch():
                    device_batch = shard_batch(
                        {k: v for k, v in batch.items() if k != "fname"}, mesh
                    )
                    _m, score, _f = eval_step(state, device_batch,
                                              frontend_params)
                    take = min(remaining, config.batch_size)
                    e_scores.append(_fused_host_scores(score)[:take])
                    e_labels.append(batch["label"][:take])
                    if collect_eval_feats:
                        e_feats.append(np.asarray(_f)[:take])
                        e_label_chunks.append(batch["label"][:take])
                    remaining -= take
            else:
                for batch in SequentialIterator(eval_set, config.batch_size,
                                                config.feat_len, config.padding):
                    device_batch = shard_batch(
                        {k: v for k, v in batch.items()
                         if k not in ("fname", "valid")},
                        mesh,
                    )
                    _m, score, _f = eval_step(state, device_batch,
                                              frontend_params)
                    valid = batch["valid"]
                    e_scores.append(_fused_host_scores(score)[valid])
                    e_labels.append(batch["label"][valid])
                    if collect_eval_feats:
                        e_feats.append(np.asarray(_f)[valid])
                        e_label_chunks.append(batch["label"][valid])
            es, el = np.concatenate(e_scores), np.concatenate(e_labels)
            test_eer = min(
                compute_eer(es[el == 0], es[el == 1])[0],
                compute_eer(-es[el == 0], -es[el == 1])[0],
            )
            with open(os.path.join(config.out_fold, "test_loss.log"), "a") as f:
                f.write(f"{epoch}\t{test_eer}\n")

        # ---- embedding visualization (main_train.py:604-614, every 3rd
        # epoch starting at epoch 0): dev AND eval panels, matching
        # /root/reference/visualize.py:67-89; falls back to dev-only when
        # no eval set is being scored. ----
        if config.visualize and (epoch + 1) % 3 == 1:
            from asvspoof2021_air_tpu.visualize import visualize_dev_and_eval

            feats_np = np.concatenate(dev_feats)
            if config.add_loss in ("isolate", "iso_sq", "ang_iso"):
                center = np.asarray(state.loss_params["center"])
                if config.ensemble > 1:  # stacked member axis: member 0
                    center = center[0]
            else:
                center = feats_np[labels == 0].mean(0, keepdims=True)
            if e_feats:
                eval_feats_np = np.concatenate(e_feats)
                eval_labels_np = np.concatenate(e_label_chunks)
            else:  # no --test_on_eval: dev-only figure, not duplicated panels
                eval_feats_np, eval_labels_np = None, None
            visualize_dev_and_eval(
                feats_np, labels, eval_feats_np, eval_labels_np, center,
                seed=config.seed, out_fold=config.out_fold, epoch=epoch + 1,
            )

        # ---- checkpoints + model selection (main_train.py:674-714) ----
        save_checkpoint(
            os.path.join(config.out_fold, "checkpoint", str(epoch + 1)), state
        )
        if val_loss < prev_loss:
            save_checkpoint(os.path.join(config.out_fold, "best"), state)
            prev_loss = val_loss
            early_stop = 0
        else:
            early_stop += 1
        with open(meta_path, "w") as f:
            json.dump({"epoch": epoch + 1, "best_dev_loss": prev_loss,
                       "early_stop": early_stop}, f)
        summary.update(
            epochs=epoch + 1, dev_loss=val_loss, dev_eer=eer,
            epoch_seconds=time.time() - t0,
        )
        if early_stop == config.early_stop_patience:
            break

    summary["best_dev_loss"] = prev_loss
    return summary
