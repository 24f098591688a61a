"""DET curve and equal error rate.

Algorithmic parity with the reference implementation
(/root/reference/eval_metrics.py:19-46): stable mergesort over pooled scores,
cumulative-sum sweep of the decision threshold, EER at the operating point
minimizing |FRR - FAR|. Exact parity matters because the in-repo baseline
numbers (BASELINE.md) are defined by this estimator.
"""

from __future__ import annotations

import numpy as np


def compute_det_curve(target_scores, nontarget_scores):
    """Sweep all thresholds; return (frr, far, thresholds).

    Higher scores must indicate stronger support for the target (bona fide)
    class. Output arrays have length ``n_target + n_nontarget + 1``; the first
    entry is the (FRR=0, FAR=1) corner at a threshold just below the minimum
    score.
    """
    target_scores = np.asarray(target_scores, dtype=np.float64).ravel()
    nontarget_scores = np.asarray(nontarget_scores, dtype=np.float64).ravel()
    n_tar = target_scores.size
    n_non = nontarget_scores.size
    if n_tar == 0 or n_non == 0:
        raise ValueError("need at least one target and one nontarget score")

    pooled = np.concatenate((target_scores, nontarget_scores))
    is_target = np.concatenate(
        (np.ones(n_tar, dtype=np.float64), np.zeros(n_non, dtype=np.float64))
    )

    # Stable sort keeps tie-breaking identical to the reference estimator.
    order = np.argsort(pooled, kind="mergesort")
    is_target = is_target[order]

    # After seeing the k smallest scores as "rejected": FRR counts rejected
    # targets, FAR counts still-accepted nontargets.
    tar_below = np.cumsum(is_target)
    non_above = n_non - (np.arange(1, pooled.size + 1) - tar_below)

    frr = np.concatenate(([0.0], tar_below / n_tar))
    far = np.concatenate(([1.0], non_above / n_non))
    thresholds = np.concatenate(([pooled[order[0]] - 0.001], pooled[order]))
    return frr, far, thresholds


def compute_eer(target_scores, nontarget_scores):
    """Equal error rate and its threshold.

    Returns ``(eer, threshold)`` where eer is the mean of FRR and FAR at the
    operating point minimizing their absolute difference
    (cf. /root/reference/eval_metrics.py:40-46).
    """
    frr, far, thresholds = compute_det_curve(target_scores, nontarget_scores)
    idx = int(np.argmin(np.abs(frr - far)))
    eer = float((frr[idx] + far[idx]) / 2.0)
    return eer, float(thresholds[idx])


def polarity_min_eer(target_scores, nontarget_scores):
    """EER invariant to score polarity.

    Callers in the reference take ``min(EER(s), EER(-s))`` because some loss
    heads emit negated cosine scores (/root/reference/main_train.py:662-664,
    score_fusion.py:117-119). Returns the minimum of both polarities.
    """
    eer_pos, _ = compute_eer(target_scores, nontarget_scores)
    eer_neg, _ = compute_eer(-np.asarray(target_scores), -np.asarray(nontarget_scores))
    return min(eer_pos, eer_neg)
