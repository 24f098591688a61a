"""bench.py measurement-integrity guards (no device work; pure helpers)."""

import sys

sys.path.insert(0, "/root/repo")  # bench.py lives at the repo root

import bench


def test_timed_attempts_passes_plausible_reading_through():
    readings = iter([0.010])
    dt, suspect = bench._timed_attempts(lambda: next(readings), floor_ms=4.0)
    assert dt == 0.010 and suspect is False


def test_timed_attempts_retries_then_accepts():
    # one relay glitch (1 ms for a >4 ms graph), then a real reading
    readings = iter([0.001, 0.0205])
    dt, suspect = bench._timed_attempts(lambda: next(readings), floor_ms=4.0)
    assert dt == 0.0205 and suspect is False


def test_timed_attempts_flags_persistent_glitch():
    """If every attempt stays below the plausibility floor, the max is
    recorded and suspect=True — BENCH json must never contain a physically
    impossible number indistinguishable from a real one (VERDICT r1)."""
    readings = iter([0.001, 0.0005, 0.002])
    dt, suspect = bench._timed_attempts(lambda: next(readings), floor_ms=4.0)
    assert suspect is True
    assert dt == 0.002  # least-glitched of the attempts
