"""Reproducibility helpers (capability of /root/reference/utils.py:9-35).

JAX is functionally deterministic given its PRNG keys; seeding here covers
the host-side numpy/python randomness used by the data pipeline.
"""

from __future__ import annotations

import os
import random

import numpy as np


def setup_seed(seed: int) -> np.random.Generator:
    """Seed python/numpy global RNGs and return a fresh numpy Generator.

    Default seed in the reference CLI: 688 (/root/reference/main_train.py:26).
    """
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return np.random.default_rng(seed)


def str2bool(v) -> bool:
    """Permissive CLI boolean (capability of /root/reference/utils.py:9-10)."""
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in ("y", "yes", "t", "true", "on", "1"):
        return True
    if s in ("n", "no", "f", "false", "off", "0"):
        return False
    raise ValueError(f"invalid truth value {v!r}")
