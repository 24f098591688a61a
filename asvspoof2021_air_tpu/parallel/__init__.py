"""Device-mesh parallelism: SPMD data-parallel sharding over ICI."""

from asvspoof2021_air_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_sharding"]
