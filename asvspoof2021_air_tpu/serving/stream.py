"""Scanned multi-batch serving dispatch (framework-original).

The device-trace roofline (tools/perf/trace_roofline.py, docs/
PERFORMANCE.md) puts the flagship inference graph at 6.44 ms of device
time against ~7.9 ms of wall time per dispatched batch: the axon relay
cannot overlap consecutive dispatches, so per-batch serving pays a
~1.4 ms dispatch gap. The train path already amortizes the same gap by
scanning K steps inside one program (train/steps.make_multi_step); this
module does the equivalent for inference: `lax.scan` the per-batch
scorer over K stacked batches so K batches cost one dispatch.

The reference scores one utterance per step (/root/reference/
generate_score.py:73); this is the opposite end of that axis.
"""

from __future__ import annotations

from typing import Callable

import jax


def make_scanned_infer(infer_fn: Callable) -> Callable:
    """Jitted runner applying ``infer_fn`` to K stacked batches in one
    dispatch.

    ``infer_fn(*batch) -> out`` is any per-batch function (typically an
    already-traced scorer closure). The returned callable takes the same
    positional arguments with a leading K axis on every array leaf and
    returns outputs with the same leading K axis, in order. Iterations
    run sequentially on device (scan), so peak memory matches the
    per-batch graph plus the stacked inputs.
    """

    @jax.jit
    def run(*stacked):
        def body(carry, batch):
            return carry, infer_fn(*batch)

        _, out = jax.lax.scan(body, None, stacked)
        return out

    return run
