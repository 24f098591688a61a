"""Standalone embedding-visualization CLI
(capability of /root/reference/visualize.py:13-89 as a runnable command —
the reference module is importable only and crashes on its own imports,
visualize.py:7; training-time plotting lives in train/loop.py).

Loads a trained run (args.json + checkpoint), extracts dev (and optionally
eval) embeddings from cached features, and writes the reference's 2x2
t-SNE/PCA PDF with the loss center(s) marked.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from asvspoof2021_air_tpu.cli.generate_score import load_system
from asvspoof2021_air_tpu.data.datasets import ASVspoof2019FeatureDataset
from asvspoof2021_air_tpu.data.pipeline import SequentialIterator
from asvspoof2021_air_tpu.visualize import visualize_dev_and_eval


def _make_embed(model, variables):
    import jax

    @jax.jit
    def embed(feats):
        emb, _logits = model.apply(variables, feats, False)
        return emb

    return embed


def _extract(embed, dataset, batch_size, feat_len, padding, limit=5000):
    feats_out, labels_out = [], []
    n = 0
    for batch in SequentialIterator(dataset, batch_size, feat_len, padding):
        valid = batch["valid"]
        feats_out.append(np.asarray(embed(batch["feat"]))[valid])
        labels_out.append(np.asarray(batch["label"])[valid])
        n += int(valid.sum())
        if n >= limit:
            break
    return np.concatenate(feats_out)[:limit], np.concatenate(labels_out)[:limit]


def main(argv=None):
    p = argparse.ArgumentParser("embedding visualization (t-SNE + PCA)")
    p.add_argument("--model_folder", type=str, default="./models")
    p.add_argument("-n", "--model_name", type=str, required=True)
    p.add_argument("-f", "--ori_features", type=str, required=True)
    p.add_argument("-a", "--access_type", type=str, default="LA")
    p.add_argument("--eval_part", type=str, default="",
                   help="also embed this part (e.g. 'eval') for the eval "
                        "panels; defaults to re-using dev")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--sample", type=int, default=5000)
    p.add_argument("--checkpoint", type=str, default="best")
    p.add_argument("-o", "--out_fold", type=str, default="")
    args = p.parse_args(argv)

    model_dir = os.path.join(args.model_folder, args.model_name)
    ckpt = args.checkpoint
    if ckpt != "best" and not os.path.isabs(ckpt):
        ckpt = os.path.join("checkpoint", ckpt)
    model, variables, _loss_mod, loss_vars, cfg = load_system(model_dir, ckpt)
    if cfg.ensemble > 1:  # visualize member 0, like the training loop
        variables, loss_vars = variables[0], loss_vars[0]

    embed = _make_embed(model, variables)  # one jit shared by both parts
    dev_set = ASVspoof2019FeatureDataset(
        args.access_type, args.ori_features, "dev", cfg.feat
    )
    dev_feat, dev_labels = _extract(
        embed, dev_set, args.batch_size, cfg.feat_len, cfg.padding,
        args.sample,
    )
    if args.eval_part:
        eval_set = ASVspoof2019FeatureDataset(
            args.access_type, args.ori_features, args.eval_part, cfg.feat
        )
        eval_feat, eval_labels = _extract(
            embed, eval_set, args.batch_size, cfg.feat_len, cfg.padding,
            args.sample,
        )
    else:
        eval_feat, eval_labels = dev_feat, dev_labels

    if (cfg.add_loss in ("isolate", "iso_sq", "ang_iso")
            and loss_vars is not None):
        center = np.asarray(loss_vars["params"]["center"])
    else:
        center = dev_feat[dev_labels == 0].mean(0, keepdims=True)

    out_fold = args.out_fold or model_dir
    path = visualize_dev_and_eval(
        dev_feat, dev_labels, eval_feat, eval_labels, center,
        seed=cfg.seed, out_fold=out_fold,
    )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
