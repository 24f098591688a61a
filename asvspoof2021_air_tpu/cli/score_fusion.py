"""Score-fusion CLI (capability of /root/reference/score_fusion.py:93-120):
average or entropy-weighted fusion of system score files, printing the fused
polarity-min EER."""

from __future__ import annotations

import argparse
import os

from asvspoof2021_air_tpu.fusion import avg_fuse, fused_eer, weighted_fuse


def main(argv=None):
    p = argparse.ArgumentParser("Result Fusion Utility")
    p.add_argument("-i", "--input", type=str, nargs="+", required=True)
    p.add_argument("-o", "--output", type=str, default="./fuse_scores/")
    p.add_argument("-m", "--method", type=str, required=True,
                   choices=["avg", "wght"])
    args = p.parse_args(argv)

    os.makedirs(args.output, exist_ok=True)
    out_file = os.path.join(args.output, "avg_fuse_score")
    if args.method == "avg":
        result = avg_fuse(args.input, out_file)
    else:
        result = weighted_fuse(args.input, output=out_file)
    print(fused_eer(result))


if __name__ == "__main__":
    main()
