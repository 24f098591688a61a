"""Multi-host SPMD setup.

The reference is strictly single-process/single-GPU (device picked by env
var, /root/reference/main_train.py:101). The TPU-native scale-out story:
`jax.distributed.initialize()` per host, one global mesh over all chips,
per-host data loading of disjoint shards, and globally-sharded batches via
`make_global_batch` — gradients all-reduce over ICI through GSPMD with no
user-visible collectives.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-op in single-process settings; on TPU
    pods the arguments are auto-discovered from the environment."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-process run (no coordinator configured): nothing to do
        pass


def host_shard_range(n_items: int) -> range:
    """The slice of a dataset this host is responsible for loading (disjoint
    contiguous shards across processes)."""
    per = -(-n_items // jax.process_count())
    start = jax.process_index() * per
    return range(start, min(start + per, n_items))


def make_global_batch(local_batch: Dict[str, np.ndarray], mesh: Mesh,
                      axis_name: str = "data") -> Dict[str, Any]:
    """Assemble a globally-sharded batch from per-host local arrays.

    Each host contributes its local shard; the returned jax.Arrays are
    globally addressable with the batch axis sharded over the mesh
    (jax.make_array_from_process_local_data handles the host->device
    scatter)."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return {k: put(v) for k, v in local_batch.items()}
