"""Batched scoring / inference: model checkpoints -> score files.

Capability of the reference scoring entry
(/root/reference/generate_score.py:38-119), redesigned TPU-first: instead of
a batch_size=1 DataLoader loop, utterances are scored in fixed-size batches
through one jitted forward (optionally with the on-device LFCC front-end),
sharded over the data mesh.

Score semantics (generate_score.py:102-111 + the writer's negation at
:114-119): the file stores -score where score defaults to
-softmax(logits)[:, 0] and is overridden per add-loss:
  ocsoftmax -> loss module's score output (negated cosine),
  amsoftmax -> softmax(cos logits)[:, 0],
  p2sgrad   -> -cos_theta[:, 0].
Net effect for ocsoftmax: files store +cos(embedding, center), bona fide
around +1 (confirmed by the shipped reference score files).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.data.datasets import (
    ASVspoof2019FeatureDataset,
    AugmentedFeatureDataset,
    EvalFeatureDataset,
)
from asvspoof2021_air_tpu.data.pipeline import SequentialIterator
from asvspoof2021_air_tpu.serving.stream import make_scanned_infer

TASKS = ("LA", "DF", "19dev", "19laaugdev", "19lapaaugdev", "19dfaugdev",
         "19dfpaaugdev", "19eval")

LABEL_NAMES = {0: "bonafide", 1: "spoof"}


def build_task_dataset(task: str, paths: Dict[str, str], feature: str = "LFCC"):
    """Task router (/root/reference/generate_score.py:51-72). `paths` maps
    role names to directories: ori_features, aug_features, la_eval, df_eval."""
    if task == "LA":
        return EvalFeatureDataset(paths["la_eval"], feature)
    if task == "DF":
        return EvalFeatureDataset(paths["df_eval"], feature)
    if task == "19dev":
        return ASVspoof2019FeatureDataset("LA", paths["ori_features"], "dev", feature)
    if task == "19eval":
        return ASVspoof2019FeatureDataset("LA", paths["ori_features"], "eval", feature)
    if task in ("19laaugdev", "19lapaaugdev", "19dfaugdev", "19dfpaaugdev"):
        variant = "LA" if "la" in task[:6] else "DF"
        with_device = "pa" in task
        return AugmentedFeatureDataset(
            paths["ori_features"], paths["aug_features"], "dev", feature,
            variant, with_device,
        )
    raise ValueError(f"unknown task {task!r}; choices: {TASKS}")


def score_rule(add_loss: Optional[str], emb, logits, loss_module=None,
               loss_vars=None):
    """The per-loss scoring rule, shared by batch scoring, raw scoring, the
    training eval step's conventions, and serving export.

    ocsoftmax/ang_iso and p2sgrad use the loss module's score output;
    amsoftmax uses softmax over its cosine logits; isolate/iso_sq score by
    distance to the learned center (the rule the training loop selects
    models with, /root/reference/main_train.py:526-577); anything else
    falls back to -softmax(logits)[:, 0]
    (/root/reference/generate_score.py:102-111)."""
    if add_loss in ("ocsoftmax", "ang_iso", "p2sgrad"):
        labels = jnp.zeros((emb.shape[0],), jnp.int32)
        _loss, score = loss_module.apply(loss_vars, emb, labels)
        return score
    if add_loss == "amsoftmax":
        labels = jnp.zeros((emb.shape[0],), jnp.int32)
        outputs, _m = loss_module.apply(loss_vars, emb, labels)
        return jax.nn.softmax(outputs, axis=1)[:, 0]
    if add_loss in ("isolate", "iso_sq"):
        center = loss_vars["params"]["center"]
        return jnp.linalg.norm(emb - center, axis=1)
    return -jax.nn.softmax(logits, axis=1)[:, 0]


def make_score_fn(model, variables, loss_module=None, loss_vars=None,
                  add_loss: Optional[str] = None) -> Callable:
    """Jitted batched scorer: feats (B, T, F) -> raw score (B,) following the
    reference's per-loss scoring rules."""

    def score_fn(feats):
        emb, logits = model.apply(variables, feats, False)
        return score_rule(add_loss, emb, logits, loss_module, loss_vars)

    return jax.jit(score_fn)


def score_to_file(
    score_fn: Callable,
    dataset,
    output_path: str,
    labeled: bool,
    batch_size: int = 64,
    feat_len: int = 750,
    padding: str = "repeat",
    shard: Optional[Callable] = None,
    scan_batches: int = 1,
) -> str:
    """Run batched scoring over a dataset and write the reference-format
    score file: ``fname -score [bonafide|spoof]`` lines
    (/root/reference/generate_score.py:114-119).

    ``scan_batches=K`` groups K consecutive batches into one scanned
    dispatch (serving/stream.py) — identical scores, fewer dispatches;
    worthwhile on the TPU relay where each dispatch pays ~1.4 ms of
    non-overlapped latency (docs/PERFORMANCE.md roofline section)."""
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    it = SequentialIterator(dataset, batch_size, feat_len, padding)

    def write_scored(f, batch, scores):
        for j in np.nonzero(batch["valid"])[0]:
            if labeled:
                key = LABEL_NAMES[int(batch["label"][j])]
                f.write(f"{batch['fname'][j]} {-scores[j]} {key}\n")
            else:
                f.write(f"{batch['fname'][j]} {-scores[j]}\n")

    def batch_feats(batch):
        feats = batch["feat"]
        return shard(feats) if shard is not None else feats

    scanned = (make_scanned_infer(score_fn) if scan_batches > 1 else None)
    with open(output_path, "w") as f:
        group: list = []
        for batch in it:
            if scanned is None:
                write_scored(f, batch, np.asarray(score_fn(
                    batch_feats(batch))))
                continue
            group.append(batch)
            if len(group) == scan_batches:
                stacked = np.stack([batch_feats(b) for b in group])
                for b, s in zip(group, np.asarray(scanned(stacked))):
                    write_scored(f, b, s)
                group = []
        # tail shorter than the scan length: per-batch dispatches keep the
        # compiled scan shape static
        for batch in group:
            write_scored(f, batch, np.asarray(score_fn(batch_feats(batch))))
    return output_path


def test_on_asvspoof2021(
    task: str,
    model,
    variables,
    paths: Dict[str, str],
    output_score_path: str,
    model_name: str,
    add_loss: Optional[str] = None,
    loss_module=None,
    loss_vars=None,
    batch_size: int = 64,
    feature: str = "LFCC",
    feat_len: int = 750,
    padding: str = "repeat",
    scan_batches: int = 1,
) -> str:
    """End-to-end scoring for one task; returns the score file path.

    Output naming mirrors the reference (:77-82): '19*' tasks write
    <out>/<model_name>_<task>_score.txt; challenge tasks write
    <out>/<model_name>_<task>/score.txt.
    """
    dataset = build_task_dataset(task, paths, feature)
    if "19" in task:
        out = os.path.join(output_score_path, f"{model_name}_{task}_score.txt")
    else:
        out = os.path.join(output_score_path, f"{model_name}_{task}", "score.txt")
    score_fn = make_score_fn(model, variables, loss_module, loss_vars, add_loss)
    labeled = "19" in task
    return score_to_file(score_fn, dataset, out, labeled, batch_size,
                         feat_len, padding, scan_batches=scan_batches)


def score_raw_to_file(
    model,
    variables,
    dataset,
    output_path: str,
    labeled: bool,
    frontend,
    loss_module=None,
    loss_vars=None,
    add_loss: Optional[str] = None,
    batch_size: int = 64,
) -> str:
    """Cache-free scoring: raw-audio dataset -> on-device front-end -> model
    -> score file. The deployment path with no feature materialization at
    all (pairs with train.frontend.OnDeviceFrontend / --on_the_fly)."""
    import jax.numpy as jnp

    from asvspoof2021_air_tpu.data.pipeline import WaveformIterator

    def score_fn(batch_dev, fe_params):
        feats = frontend(batch_dev, jax.random.PRNGKey(0), fe_params)
        emb, logits = model.apply(variables, feats, False)
        return score_rule(add_loss, emb, logits, loss_module, loss_vars)

    jitted = jax.jit(score_fn)
    fe_params = getattr(frontend, "params", None)
    n = len(dataset)
    it = WaveformIterator(dataset, batch_size, frontend.min_samples(),
                          ratio=1.0, seed=0, shuffle=False,
                          steps_per_epoch=-(-n // batch_size))
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    written = 0
    with open(output_path, "w") as f:
        for batch in it.epoch():
            dev = {k: v for k, v in batch.items() if k in ("wave", "length")}
            scores = np.asarray(jitted(dev, fe_params))
            for j in range(len(scores)):
                if written >= n:
                    break
                if labeled:
                    key = LABEL_NAMES[int(batch["label"][j])]
                    f.write(f"{batch['fname'][j]} {-scores[j]} {key}\n")
                else:
                    f.write(f"{batch['fname'][j]} {-scores[j]}\n")
                written += 1
    return output_path
