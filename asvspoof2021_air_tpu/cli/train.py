"""Training CLI — flag-for-flag coverage of the reference entry
(/root/reference/main_train.py:23-95)."""

from __future__ import annotations

import argparse

from asvspoof2021_air_tpu.train.loop import TrainConfig, train
from asvspoof2021_air_tpu.utils import str2bool


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seed", type=int, default=688)
    p.add_argument("-a", "--access_type", type=str, default="LA",
                   choices=["LA", "PA"])
    p.add_argument("-d", "--path_to_database", type=str, default="")
    p.add_argument("-f", "--path_to_features", type=str, default="")
    p.add_argument("--path_to_aug_features", type=str, default="")
    p.add_argument("-o", "--out_fold", type=str, required=True)
    p.add_argument("--ratio", type=float, default=0.5,
                   help="original:augmented mix in a training batch")
    p.add_argument("--feat", type=str, default="LFCC",
                   choices=["CQCC", "LFCC", "Melspec", "STFT"])
    p.add_argument("--feat_len", type=int, default=750)
    p.add_argument("--feat_dim", type=int, default=60)
    p.add_argument("--pad_chop", type=str2bool, nargs="?", const=True,
                   default=True)
    p.add_argument("--padding", type=str, default="repeat",
                   choices=["zero", "repeat", "silence"])
    p.add_argument("--enc_dim", type=int, default=256)
    p.add_argument("-m", "--model", default="lcnn",
                   choices=["cnn", "resnet", "lcnn", "res2net", "ecapa",
                            "rawnet"])
    p.add_argument("--num_epochs", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=0.0005)
    p.add_argument("--lr_decay", type=float, default=0.5)
    p.add_argument("--interval", type=int, default=30)
    p.add_argument("--beta_1", type=float, default=0.9)
    p.add_argument("--beta_2", type=float, default=0.999)
    p.add_argument("--eps", type=float, default=1e-8)
    p.add_argument("--base_loss", type=str, default="ce", choices=["ce", "bce"])
    p.add_argument("--add_loss", type=str, default=None,
                   choices=[None, "isolate", "iso_sq", "ang_iso", "p2sgrad"])
    p.add_argument("--weight_loss", type=float, default=1.0)
    p.add_argument("--r_real", type=float, default=0.9)
    p.add_argument("--r_fake", type=float, default=0.2)
    p.add_argument("--alpha", type=float, default=20.0)
    p.add_argument("--num_centers", type=int, default=3)
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--test_only", action="store_true")
    p.add_argument("--continue_training", action="store_true")
    p.add_argument("--ADV_AUG", type=str2bool, nargs="?", const=True,
                   default=False)
    p.add_argument("--LA_aug", type=str2bool, nargs="?", const=True,
                   default=False)
    p.add_argument("--DF_aug", type=str2bool, nargs="?", const=True,
                   default=False)
    p.add_argument("--LAPA_aug", type=str2bool, nargs="?", const=True,
                   default=False)
    p.add_argument("--DFPA_aug", type=str2bool, nargs="?", const=True,
                   default=False)
    p.add_argument("--lambda_", type=float, default=0.05)
    p.add_argument("--lr_d", type=float, default=0.0001)
    p.add_argument("--test_on_eval", action="store_true")
    p.add_argument("--ensemble", type=int, default=1,
                   help="train N independently-initialized systems in one "
                        "vmapped step; dev/eval scores are avg-fused "
                        "(the reference's 3-system fusion workflow as one "
                        "training run)")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="optimizer steps scanned per device dispatch")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of the first ~20 steps")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="model compute dtype (params always float32)")
    p.add_argument("--fused_pool", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="ECAPA attentive pooling via the differentiable "
                        "Pallas kernel (ops/attn_pool_vjp; same math and "
                        "checkpoint tree, faster train steps on TPU). "
                        "auto = on for TPU backends only")
    p.add_argument("--fused_bn", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="relu<->batchnorm pairs via the recompute-VJP "
                        "(ops/bn_relu_vjp; same math and checkpoint tree, "
                        "lighter train-mode residuals). auto = on for TPU "
                        "backends only")
    p.add_argument("--on_the_fly", type=str2bool, nargs="?", const=True,
                   default=False,
                   help="train straight from raw audio: augmentation + LFCC "
                        "fused into the jitted step (needs -d database path)")
    p.add_argument("--on_device_aug", type=str2bool, nargs="?", const=True,
                   default=False,
                   help="per-utterance random channel simulation each step "
                        "(on_the_fly mode); dev monitoring stays clean "
                        "unless --dev_aug is set — see README 'Deliberate "
                        "behavioral deviations'")
    p.add_argument("--apply_ir", type=str2bool, nargs="?", const=True,
                   default=False,
                   help="also convolve a random impulse response (on_the_fly)")
    p.add_argument("--dev_aug", type=str2bool, nargs="?", const=True,
                   default=False,
                   help="monitor dev loss on a fixed-draw AUGMENTED dev "
                        "view (on_the_fly+on_device_aug): the on-the-fly "
                        "analog of the reference's mixed valOri+valAug "
                        "selection; scoring/test_on_eval stay clean")
    p.add_argument("--auto_resume", type=str2bool, nargs="?", const=True,
                   default=False,
                   help="resume from the latest epoch checkpoint in out_fold")
    p.add_argument("--config", type=str, default=None,
                   help="JSON file of TrainConfig fields; CLI flags that are "
                        "explicitly set override it")
    return p


def config_from_args(args: argparse.Namespace) -> TrainConfig:
    if not (0 < args.ratio <= 1):
        raise SystemExit(
            f"--ratio must be in (0, 1], got {args.ratio} "
            "(fraction of original data per batch; the rest is augmented)"
        )
    fields = {f for f in TrainConfig.__dataclass_fields__}
    kwargs = {k: v for k, v in vars(args).items() if k in fields}
    # Eager add_loss validation: --config JSON values bypass argparse
    # choices, and an unsupported name would otherwise crash at first trace
    # mid-setup. 'ocsoftmax' is the same module as 'ang_iso'
    # (/root/reference/loss.py:62-97 == :176-206) — normalize it.
    add_loss = kwargs.get("add_loss")
    if add_loss == "ocsoftmax":
        kwargs["add_loss"] = "ang_iso"
    elif add_loss not in (None, "isolate", "iso_sq", "ang_iso", "p2sgrad"):
        raise SystemExit(
            f"--add_loss '{add_loss}' is not trainable; choose from "
            "isolate|iso_sq|ang_iso|p2sgrad (ocsoftmax is an alias of "
            "ang_iso)"
        )
    return TrainConfig(**kwargs)


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.config:
        import json

        with open(args.config) as f:
            parser.set_defaults(**json.load(f))
        # re-parse: file values act as defaults, explicit CLI flags override
        args = parser.parse_args(argv)
    config = config_from_args(args)
    if args.test_only:
        print("test_only: use cli.generate_score for scoring")
        return
    summary = train(config)
    print(summary)


if __name__ == "__main__":
    main()
