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
    """Production must run ahead of consumption (the whole point of the
    pipeline). Asserted via production-order events, not wall-clock
    thresholds — absolute timings flake under a loaded machine (e.g. the
    -n 4 suite run)."""
    produced = []

    class Tracked:
        steps_per_epoch = 5

        def epoch(self):
            for i in range(5):
                produced.append(i)
                yield {"i": i}

    it = PrefetchIterator(Tracked(), depth=2)
    gen = it.epoch()
    first = next(gen)
    assert first["i"] == 0
    # While the consumer holds item 0, the producer thread keeps going and
    # fills the depth-2 queue: items 1 and 2 (plus one blocked in put) get
    # produced without any further consumption. Poll with a generous
    # deadline — this waits on producer progress, not on speed.
    deadline = time.monotonic() + 10.0
    while len(produced) < 3 and time.monotonic() < deadline:
        time.sleep(0.005)
    assert len(produced) >= 3, (
        f"producer did not run ahead of the consumer: produced={produced}"
    )
    assert [b["i"] for b in gen] == [1, 2, 3, 4]


def test_prefetch_propagates_errors():
    class Bad:
        def epoch(self):
            yield {"i": 0}
            raise RuntimeError("boom")

    it = PrefetchIterator(Bad())
    with pytest.raises(RuntimeError, match="boom"):
        list(it.epoch())
