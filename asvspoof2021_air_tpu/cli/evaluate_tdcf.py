"""EER / min-tDCF evaluation CLI
(capability of /root/reference/evaluate_tDCF_asvspoof19.py)."""

from __future__ import annotations

import argparse

from asvspoof2021_air_tpu.metrics import compute_eer_and_tdcf


def main(argv=None):
    p = argparse.ArgumentParser("EER and min-tDCF of a CM score file")
    p.add_argument("cm_score_file", type=str)
    p.add_argument("--path_to_database", type=str, default=None)
    p.add_argument("--asv_score_file", type=str, default=None)
    p.add_argument("--plot", action="store_true")
    args = p.parse_args(argv)

    eer, min_tdcf = compute_eer_and_tdcf(
        args.cm_score_file, args.path_to_database, args.asv_score_file,
        plot=args.plot,
    )
    print({"eer": eer, "min_tdcf": min_tdcf})


if __name__ == "__main__":
    main()
