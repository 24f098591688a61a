"""Scoring CLI — capability of the reference scoring entry
(/root/reference/generate_score.py:10-36), batched on device.

The reference pickles whole torch modules; here systems are rebuilt from the
out_fold's args.json + the structured 'best' checkpoint (which also fixes
the reference's checkpoint-naming mismatch, generate_score.py:135 vs
main_train.py:694)."""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.losses import build_loss
from asvspoof2021_air_tpu.models import build_model
from asvspoof2021_air_tpu.scoring import TASKS, test_on_asvspoof2021
from asvspoof2021_air_tpu.train.checkpoint import restore_checkpoint
from asvspoof2021_air_tpu.train.loop import TrainConfig, setup_training


def load_system(model_dir: str, checkpoint: str = "best"):
    """Rebuild (model, variables, loss_mod, loss_vars, config) from a
    training out_fold. For an --ensemble run the checkpoint holds stacked
    member states: variables/loss_vars are lists with one entry per member
    (scored separately, then avg-fused like the reference's 3-system
    workflow)."""
    with open(os.path.join(model_dir, "args.json")) as f:
        cfg_dict = json.load(f)
    fields = set(TrainConfig.__dataclass_fields__)
    config = TrainConfig(**{k: v for k, v in cfg_dict.items() if k in fields})

    model, loss_mod, state, _ts, _es = setup_training(config, steps_per_epoch=1)
    state = restore_checkpoint(os.path.join(model_dir, checkpoint), state)
    if config.ensemble > 1:
        from asvspoof2021_air_tpu.train.ensemble import member_state

        members = [member_state(state, i) for i in range(config.ensemble)]
    else:
        members = [state]
    variables = [
        {"params": m.params, "batch_stats": m.batch_stats} for m in members
    ]
    loss_vars = [
        {"params": m.loss_params} if m.loss_params is not None else None
        for m in members
    ]
    if config.ensemble == 1:
        return model, variables[0], loss_mod, loss_vars[0], config
    return model, variables, loss_mod, loss_vars, config


def write_fused_score_file(member_files, output: str,
                           weights=None) -> str:
    """Combine member score files into a fused file in the SAME layout the
    single-system path writes (2-column ``fname score`` for challenge
    tasks, 3-column ``fname score key`` for labeled 19* tasks — the layout
    external consumers/submissions expect). Members are written by the same
    sequential iterator over the same dataset, so rows align 1:1.
    ``weights`` (default: equal = average fusion) weight each member's
    scores."""
    import numpy as np

    from asvspoof2021_air_tpu.metrics.evaluate import read_score_file

    frames = [read_score_file(p) for p in member_files]
    base = frames[0]
    for fr in frames[1:]:
        if not np.array_equal(fr["fname"], base["fname"]):
            raise ValueError(
                "member score files disagree on trial order; cannot fuse"
            )
    if weights is None:
        weights = [1.0 / len(frames)] * len(frames)
    fused = np.sum([w * fr["score"] for w, fr in zip(weights, frames)],
                   axis=0)
    os.makedirs(os.path.dirname(os.path.abspath(output)), exist_ok=True)
    with open(output, "w") as f:
        for i, fname in enumerate(base["fname"]):
            if base["key"] is not None:
                f.write(f"{fname} {fused[i]} {base['key'][i]}\n")
            else:
                f.write(f"{fname} {fused[i]}\n")
    return output


def main(argv=None):
    p = argparse.ArgumentParser("generate model scores")
    p.add_argument("--model_folder", type=str, default="./models")
    p.add_argument("-n", "--model_name", type=str, required=True)
    p.add_argument("-s", "--score_dir", type=str, default="./scores")
    p.add_argument("-t", "--task", type=str, required=True, choices=TASKS)
    p.add_argument("-l", "--loss", default=None,
                   choices=[None, "softmax", "ocsoftmax", "ang_iso",
                            "isolate", "iso_sq", "amsoftmax", "p2sgrad"],
                   help="scoring rule override; defaults to the run's "
                        "trained add_loss from args.json ('softmax' forces "
                        "the plain -softmax(logits) rule)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--scan_batches", type=int, default=1,
                   help="group K batches into one scanned device dispatch "
                        "(identical scores; amortizes per-dispatch latency "
                        "on TPU — see docs/PERFORMANCE.md)")
    p.add_argument("--checkpoint", type=str, default="best",
                   help="'best' or a checkpoint epoch path under "
                        "<model>/checkpoint/<N>")
    p.add_argument("--fusion", type=str, default="avg",
                   choices=["avg", "wght"],
                   help="ensemble member fusion: average, or EER-derived "
                        "entropy weights (labeled 19* tasks only)")
    p.add_argument("--ori_features", type=str, default="")
    p.add_argument("--aug_features", type=str, default="")
    p.add_argument("--la_eval", type=str, default="")
    p.add_argument("--df_eval", type=str, default="")
    args = p.parse_args(argv)

    out_dir = "./scores" if "19" in args.task else args.score_dir

    model_dir = os.path.join(args.model_folder, args.model_name)
    ckpt = args.checkpoint
    if ckpt != "best" and not os.path.isabs(ckpt):
        ckpt = os.path.join("checkpoint", ckpt)
    model, variables, loss_mod, loss_vars, _cfg = load_system(model_dir, ckpt)

    paths = {
        "ori_features": args.ori_features,
        "aug_features": args.aug_features,
        "la_eval": args.la_eval,
        "df_eval": args.df_eval,
    }
    # Score with the rule the run was trained/selected with (cfg.add_loss)
    # unless -l overrides; keeps scoring consistent with the export path
    # and the training eval step (scoring.score_rule).
    trained = _cfg.add_loss if _cfg.add_loss not in (None, "None") else None
    if args.loss is None:
        score_loss = trained
    elif args.loss == "softmax":
        score_loss = None
    else:
        score_loss = args.loss
        aliases = {"ocsoftmax": "ang_iso", "ang_iso": "ocsoftmax"}
        if trained is not None and score_loss not in (
            trained, aliases.get(trained)
        ):
            print(f"warning: scoring rule -l {score_loss} differs from the "
                  f"run's trained add_loss {trained}", flush=True)
    if _cfg.ensemble > 1:
        # score each ensemble member, then avg-fuse into the headline file
        # (the reference's score_fusion.py:21-28 workflow in one command)
        member_files = []
        for i, (mvars, mloss) in enumerate(zip(variables, loss_vars)):
            f = test_on_asvspoof2021(
                args.task, model, mvars, paths, out_dir,
                f"{args.model_name}_member{i}",
                add_loss=score_loss, loss_module=loss_mod, loss_vars=mloss,
                batch_size=args.batch_size, feature=_cfg.feat,
                feat_len=_cfg.feat_len, padding=_cfg.padding,
                scan_batches=args.scan_batches,
            )
            member_files.append(f)
            print(f"wrote {f}")
        if "19" in args.task:
            out = os.path.join(out_dir,
                               f"{args.model_name}_{args.task}_score.txt")
        else:
            out = os.path.join(out_dir, f"{args.model_name}_{args.task}",
                               "score.txt")
        weights = None
        if args.fusion == "wght":
            # EER-derived entropy weights (reference score_fusion.py:31-89);
            # needs labeled members, i.e. a 19* task
            from asvspoof2021_air_tpu.fusion import entropy_weights
            from asvspoof2021_air_tpu.metrics.evaluate import (
                eer_from_score_file,
            )

            eers = [eer_from_score_file(f) for f in member_files]
            weights = entropy_weights(eers)
            print(f"member EERs {['%.4f' % e for e in eers]} -> "
                  f"weights {['%.3f' % w for w in weights]}")
        write_fused_score_file(member_files, out, weights)
        print(f"wrote {out} ({args.fusion} fusion of "
              f"{len(member_files)} members)")
        return
    out = test_on_asvspoof2021(
        args.task, model, variables, paths, out_dir, args.model_name,
        add_loss=score_loss, loss_module=loss_mod, loss_vars=loss_vars,
        batch_size=args.batch_size, feature=_cfg.feat,
        feat_len=_cfg.feat_len, padding=_cfg.padding,
        scan_batches=args.scan_batches,
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
