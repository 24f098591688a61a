"""Multi-host helpers on the virtual 8-device mesh (single process)."""

import numpy as np

import jax

from asvspoof2021_air_tpu.parallel import make_mesh
from asvspoof2021_air_tpu.parallel.distributed import (
    host_shard_range,
    initialize_distributed,
    make_global_batch,
)
from asvspoof2021_air_tpu.utils.profiling import StepTimer


def test_initialize_noop_single_process():
    initialize_distributed()  # must not raise in single-process mode
    assert jax.process_count() == 1


def test_host_shard_range():
    r = host_shard_range(100)
    assert r == range(0, 100)


def test_make_global_batch_sharded():
    mesh = make_mesh()
    batch = make_global_batch({"x": np.ones((16, 4), np.float32)}, mesh)
    x = batch["x"]
    assert x.shape == (16, 4)
    assert len(x.sharding.device_set) == 8


def test_step_timer():
    t = StepTimer(batch_size=8, window=3)
    out = None
    for _ in range(4):
        out = t.tick(jax.numpy.zeros(()))
    assert out is not None and out["utt_per_sec"] > 0
