"""Mesh construction and sharding helpers.

The reference trains on a single GPU selected by env var
(/root/reference/main_train.py:101, nn.DataParallel left commented at :174).
The TPU-native replacement is GSPMD data parallelism: one logical program,
batch sharded over a 1-D 'data' mesh, gradients all-reduced by XLA over ICI.
Models are <= ~20M parameters, so parameters and optimizer state are
replicated (pure DP) — the right point in the sharding space for this
workload; wider meshes scale batch, not model.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis_name: str = "data"
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else list(devices)
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data",
                batch_axis: int = 0) -> Any:
    """Device-put a host batch with its batch axis sharded over the mesh.

    batch_axis=1 handles step-stacked batches (n_steps, B, ...) for the
    scanned multi-step path (train.steps.make_multi_step)."""
    spec = [None] * batch_axis + [axis_name]
    sharding = NamedSharding(mesh, P(*spec))

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicate_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
