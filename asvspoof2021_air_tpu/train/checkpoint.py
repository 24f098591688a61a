"""Checkpointing: Orbax-backed state persistence with step retention.

Replaces the reference's whole-module pickle torch.save
(/root/reference/main_train.py:674-706) with structured pytree checkpoints:
per-epoch snapshots under <out>/checkpoint/<epoch> and a best-by-dev-loss
copy under <out>/best, covering backbone params, batch stats, both optimizer
states, and loss-module params (the reference forgets to reload the ang_iso
loss module on resume, main_train.py:269-272 — fixed here by checkpointing
the full TrainState).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except ImportError:  # pragma: no cover
    _HAVE_ORBAX = False

from flax import serialization


def save_checkpoint(path: str, state: Any) -> None:
    """Save a pytree checkpoint (Orbax when available, msgpack fallback)."""
    path = os.path.abspath(path)
    host_state = jax.tree.map(np.asarray, jax.device_get(state))
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, host_state, force=True)
    else:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".msgpack", "wb") as f:
            f.write(serialization.to_bytes(host_state))


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a checkpoint saved by save_checkpoint. With a `target`
    TrainState template the result has matching structure/dtypes."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        if target is None:
            return ckptr.restore(path)
        host_target = jax.tree.map(np.asarray, jax.device_get(target))
        return ckptr.restore(path, item=host_target)
    with open(path + ".msgpack", "rb") as f:
        data = f.read()
    if target is None:
        raise ValueError("msgpack restore requires a target template")
    return serialization.from_bytes(target, data)
