"""Worker process for the multi-host input-path test (test_multihost.py).

Run as: python multihost_worker.py <process_id> <num_processes> <port>
Each process gets 4 virtual CPU devices -> an 8-device global mesh. Loads a
disjoint host shard of a synthetic 16-item dataset via host_shard_range,
assembles the global batch with make_global_batch, and verifies both the
global math (mean over ALL items) and the local device placement.
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from asvspoof2021_air_tpu.parallel.distributed import (  # noqa: E402
    host_shard_range,
    make_global_batch,
)

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))

# Synthetic 16-item dataset: item i has value i (feature) and label i % 2.
N = 16
values = np.arange(N, dtype=np.float32)
shard = host_shard_range(N)
assert shard == range(pid * 8, pid * 8 + 8), shard

local = {
    "feat": values[list(shard)].reshape(-1, 1),
    "label": (np.asarray(list(shard)) % 2).astype(np.int32),
}
gbatch = make_global_batch(local, mesh)
assert gbatch["feat"].shape == (N, 1), gbatch["feat"].shape

# Local placement: each addressable shard must hold exactly the rows of the
# global batch its device owns — i.e. this host's shard range, in order.
rows_per_dev = N // (4 * nproc)
for s in gbatch["feat"].addressable_shards:
    dev_pos = s.index[0].start // rows_per_dev
    expect = values[s.index[0]].reshape(-1, 1)
    np.testing.assert_array_equal(np.asarray(s.data), expect), dev_pos

# Global math across hosts: mean over ALL items (GSPMD inserts the
# cross-host collective over the data axis).
mean = jax.jit(
    lambda x: jnp.mean(x),
    in_shardings=(NamedSharding(mesh, P("data")),),
    out_shardings=NamedSharding(mesh, P()),
)(gbatch["feat"])
result = float(jax.device_get(mean))
assert abs(result - values.mean()) < 1e-6, result

print(f"WORKER_OK pid={pid} mean={result}")
