"""Profiling and step timing.

The reference has no tracing/profiling beyond tqdm progress bars
(SURVEY §5); the TPU-native equivalents: jax.profiler trace capture around
training windows (viewable in XProf/TensorBoard) and a lightweight step
timer with utterances/sec accounting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed region:

        with profiling.trace("/tmp/jax-trace"):
            for _ in range(10):
                state, m = train_step(...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Windowed steps/sec + utterances/sec tracker (blocks on the given
    array to measure true device time)."""

    def __init__(self, batch_size: int, window: int = 50):
        self.batch_size = batch_size
        self.window = window
        self._t0: Optional[float] = None
        self._steps = 0

    def tick(self, result=None) -> Optional[dict]:
        """Call once per step; returns rate stats every `window` steps."""
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            self._steps = 0
            return None
        self._steps += 1
        if self._steps % self.window:
            return None
        dt = now - self._t0
        stats = {
            "steps_per_sec": self._steps / dt,
            "utt_per_sec": self._steps * self.batch_size / dt,
            "ms_per_step": 1000.0 * dt / self._steps,
        }
        self._t0 = now
        self._steps = 0
        return stats
