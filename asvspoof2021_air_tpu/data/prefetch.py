"""Background batch prefetching.

The reference's dataloader runs with num_workers=0 — fully serial item
loading in the training loop (/root/reference/main_train.py:63, flagged in
SURVEY §3.1 as the hot-loop bottleneck). Here host-side batch assembly
(file reads, pad/crop, collation) overlaps with device compute via a
daemon-thread pipeline with a small bounded queue: while the TPU runs step
N, the host builds batches N+1..N+depth.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Iterable


class PrefetchIterator:
    """Wraps any batch iterable; `epoch()` yields the same batches, produced
    ahead of time on a background thread."""

    def __init__(self, base, depth: int = 2):
        self.base = base
        self.depth = depth
        # pass through pipeline metadata
        for attr in ("steps_per_epoch", "batch_size"):
            if hasattr(base, attr):
                setattr(self, attr, getattr(base, attr))

    def _source(self) -> Iterable:
        if hasattr(self.base, "epoch"):
            return self.base.epoch()
        return iter(self.base)

    def epoch(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        _END = object()
        err = []

        def worker():
            try:
                for item in self._source():
                    q.put(item)
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(_END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            yield item
        t.join()
        if err:
            raise err[0]

    def __iter__(self) -> Iterator:
        return self.epoch()
