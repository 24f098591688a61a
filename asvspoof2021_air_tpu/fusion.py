"""Multi-system score fusion.

Capabilities of the reference fusion utility
(/root/reference/score_fusion.py): average fusion (per-trial score sum over
systems) and entropy-weighted fusion driven by per-system EERs. Pure
numpy/pandas; operates on 4-column score files (fname sysid key score).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from asvspoof2021_air_tpu.metrics import polarity_min_eer


def read_score_frame(path: str) -> pd.DataFrame:
    """Load a score file into a (fname, sysid, key, score) DataFrame.

    Accepts the 4-column layout consumed by the reference fusion utility
    (/root/reference/score_fusion.py:13-18), the 3-column
    ``fname score key`` layout actually shipped under /root/reference/scores/
    (sysid filled with "-"), and the 2-column unlabeled ``fname score``
    layout of challenge eval score files (key filled with "-").
    """
    data = np.genfromtxt(path, dtype=str)
    if data.ndim == 1:
        data = data[None, :]
    if data.shape[1] == 2:
        df = pd.DataFrame(
            {
                "fname": data[:, 0],
                "sysid": "-",
                "key": "-",
                "score": data[:, 1],
            }
        )
    elif data.shape[1] == 4:
        df = pd.DataFrame(data, columns=["fname", "sysid", "key", "score"])
    elif data.shape[1] == 3:
        df = pd.DataFrame(
            {
                "fname": data[:, 0],
                "sysid": "-",
                "key": data[:, 2],
                "score": data[:, 1],
            }
        )
    else:
        raise ValueError(f"unsupported score file with {data.shape[1]} columns: {path}")
    df["score"] = df["score"].astype(np.float64)
    return df


def avg_fuse(paths: Sequence[str], output: Optional[str] = None) -> pd.DataFrame:
    """Average fusion: per-(fname, sysid, key) sum of system scores
    (cf. /root/reference/score_fusion.py:21-28)."""
    frames = [read_score_frame(p) for p in paths]
    merged = pd.concat(frames).groupby(
        ["fname", "sysid", "key"], as_index=False
    )["score"].sum()
    if output is not None:
        merged.to_csv(output, sep=" ", header=False, index=False)
    return merged


def entropy_weights(eers: Sequence[float]) -> List[float]:
    """EER-derived entropy weights for weighted fusion.

    Min-max normalizes inverted EERs, then weights each system by one minus
    its normalized entropy contribution (cf.
    /root/reference/score_fusion.py:44-89). Systems with equal EER get equal
    weight.
    """
    weight = [float(e) for e in eers]
    max_w, min_w = max(weight), min(weight)
    if max_w == min_w:
        return [1.0 / len(weight)] * len(weight)

    for i in range(len(weight)):
        w = (max_w - weight[i]) / (max_w - min_w)
        weight[i] = w if w != 0 else 1e-5

    k = 1.0 / math.log(len(weight))
    total = sum(weight)
    for i in range(len(weight)):
        p = weight[i] / total
        lnfi = math.log(p) * p * (-k) if weight[i] != 0 else 0.0
        weight[i] = 1 - lnfi
    sum_w = sum(weight)
    return [w / sum_w for w in weight]


def weighted_fuse(
    paths: Sequence[str],
    eers: Optional[Sequence[float]] = None,
    output: Optional[str] = None,
) -> pd.DataFrame:
    """Entropy-weighted fusion: weight each system's scores, then average
    per trial (cf. /root/reference/score_fusion.py:31-43).

    When ``eers`` is omitted, each system's polarity-min EER is computed from
    its own keyed score file.
    """
    frames = [read_score_frame(p) for p in paths]
    if eers is None:
        eers = [fused_eer(f) for f in frames]
    weights = entropy_weights(eers)
    for frame, w in zip(frames, weights):
        frame["score"] = frame["score"] * w
    merged = pd.concat(frames).groupby(
        ["fname", "sysid", "key"], as_index=False
    )["score"].mean()
    if output is not None:
        merged.to_csv(output, sep=" ", header=False, index=False)
    return merged


def fused_eer(frame: pd.DataFrame) -> float:
    """Polarity-min EER of a fused (or single-system) score frame
    (cf. /root/reference/score_fusion.py:111-120)."""
    bona = frame.loc[frame["key"] == "bonafide", "score"].to_numpy()
    spoof = frame.loc[frame["key"] == "spoof", "score"].to_numpy()
    return polarity_min_eer(bona, spoof)
