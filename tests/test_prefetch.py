"""Prefetch iterator behavior."""

import time

import numpy as np
import pytest

from asvspoof2021_air_tpu.data.prefetch import PrefetchIterator


class SlowIterator:
    steps_per_epoch = 5

    def epoch(self):
        for i in range(5):
            time.sleep(0.05)
            yield {"i": i}


def test_prefetch_yields_all_in_order():
    it = PrefetchIterator(SlowIterator(), depth=2)
    assert it.steps_per_epoch == 5
    out = [b["i"] for b in it.epoch()]
    assert out == [0, 1, 2, 3, 4]
    # second epoch works too
    assert [b["i"] for b in it.epoch()] == [0, 1, 2, 3, 4]


def test_prefetch_overlaps_production():
    it = PrefetchIterator(SlowIterator(), depth=2)
    t0 = time.perf_counter()
    for b in it.epoch():
        time.sleep(0.05)  # consumer work overlapping producer work
    elapsed = time.perf_counter() - t0
    # serial would be ~0.5 s; overlapped ~0.3 s
    assert elapsed < 0.45, elapsed


def test_prefetch_propagates_errors():
    class Bad:
        def epoch(self):
            yield {"i": 0}
            raise RuntimeError("boom")

    it = PrefetchIterator(Bad())
    with pytest.raises(RuntimeError, match="boom"):
        list(it.epoch())
