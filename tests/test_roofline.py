"""Plausibility guards in tools/perf/roofline.py (pure logic, no devices)."""

import importlib.util
import os
import sys

_path = os.path.join(os.path.dirname(__file__), "..", "tools", "perf",
                     "roofline.py")
_spec = importlib.util.spec_from_file_location("roofline", _path)
roofline = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("roofline", roofline)
_spec.loader.exec_module(roofline)


def test_guarded_timing_keeps_min_of_plausible_readings():
    readings = iter([0.010, 0.008, 0.009, 0.011])
    dt, suspect = roofline._guarded_timing(lambda: next(readings),
                                           floor=0.004)
    assert (dt, suspect) == (0.008, False)


def test_guarded_timing_retries_past_glitched_readings():
    # two relay ack-without-execution glitches, then real readings
    readings = iter([0.0001, 0.0002, 0.010, 0.009, 0.010])
    dt, suspect = roofline._guarded_timing(lambda: next(readings),
                                           floor=0.004)
    assert (dt, suspect) == (0.009, False)


def test_guarded_timing_flags_persistent_glitch_with_max():
    readings = iter([0.0001, 0.0005, 0.0002] + [0.0001] * 5)
    dt, suspect = roofline._guarded_timing(lambda: next(readings),
                                           floor=0.004)
    assert suspect is True
    assert dt == 0.0005  # least-glitched attempt, never a silent fake


def test_stage_defs_flop_totals_are_consistent():
    # the analytic table must stay in sync with the model constants
    stages = roofline.stage_defs()
    names = [s[0] for s in stages]
    assert names[0] == "lfcc_frontend" and "mfa_3x_512_1536" in names
    total = sum(s[1] for s in stages)
    assert 4.0e11 < total < 5.5e11  # ~471 GFLOP analytic budget (B=64)
