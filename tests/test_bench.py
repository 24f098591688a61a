"""bench.py measurement-integrity guards (no device work; pure helpers)."""

import sys

sys.path.insert(0, "/root/repo")  # bench.py lives at the repo root

import bench


def test_timed_attempts_returns_median_of_plausible_readings():
    readings = iter([0.010, 0.012, 0.011, 0.013, 0.0105])
    dt, suspect, spread = bench._timed_attempts(
        lambda: next(readings), floor_ms=4.0)
    assert dt == 0.011 and suspect is False
    assert abs(spread - 100.0 * (0.013 - 0.010) / 0.011) < 1e-9


def test_timed_attempts_discards_glitched_readings():
    # two relay glitches (~1 ms for a >4 ms graph) among real readings:
    # the glitches are dropped, the median is over the plausible set only
    readings = iter([0.001, 0.0205, 0.0009, 0.0210, 0.0200])
    dt, suspect, spread = bench._timed_attempts(
        lambda: next(readings), floor_ms=4.0)
    assert dt == 0.0205 and suspect is False
    assert abs(spread - 100.0 * (0.0210 - 0.0200) / 0.0205) < 1e-9


def test_timed_attempts_flags_persistent_glitch():
    """If every attempt stays below the plausibility floor, the max is
    recorded and suspect=True — BENCH json must never contain a physically
    impossible number indistinguishable from a real one (VERDICT r1)."""
    readings = iter([0.001, 0.0005, 0.002, 0.0004, 0.0015])
    dt, suspect, _spread = bench._timed_attempts(
        lambda: next(readings), floor_ms=4.0)
    assert suspect is True
    assert dt == 0.002  # least-glitched of the attempts


def _results(fused=None, int8=None):
    r = {
        "infer": {"b64": {"utt_s": 8000.0, "ms_per_batch": 8.0,
                          "spread_pct": 2.0}},
        "train": {"utt_s": 2650.0, "ms_per_step": 24.1, "spread_pct": 1.5},
        "train_aug": {"utt_s": 2140.0, "ms_per_step": 29.9,
                      "spread_pct": 1.8},
    }
    if fused is not None:
        r["infer_fused"] = fused
    if int8 is not None:
        r["infer_int8"] = int8
    return r


def test_assemble_headlines_faster_fused_path():
    out = bench._assemble_result(
        _results({"utt_s": 8150.0, "ms_per_batch": 7.85,
                  "spread_pct": 3.0}), "tpu0")
    assert out["value"] == 8150.0
    assert out["serving_path"] == "fused_attn_pool"
    assert out["infer_standard_utt_s"] == 8000.0
    assert out["spread_pct"] == 3.0
    assert "suspect_timing" not in out
    assert "suspect_variance" not in out


def test_assemble_ignores_suspect_fused_reading():
    fused = {"utt_s": 90000.0, "ms_per_batch": 0.7, "suspect_timing": True}
    out = bench._assemble_result(_results(fused), "tpu0")
    assert out["value"] == 8000.0 and out["serving_path"] == "standard"


def test_assemble_without_fused_stage_uses_standard():
    out = bench._assemble_result(_results(), "cpu0")
    assert out["value"] == 8000.0 and out["serving_path"] == "standard"
    assert "infer_fused_utt_s" not in out
    assert "infer_int8_utt_s" not in out


def test_assemble_headlines_fastest_int8_path():
    out = bench._assemble_result(
        _results(fused={"utt_s": 8150.0, "ms_per_batch": 7.85},
                 int8={"utt_s": 8770.0, "ms_per_batch": 7.30}), "tpu0")
    assert out["value"] == 8770.0 and out["serving_path"] == "int8"
    assert out["infer_fused_utt_s"] == 8150.0
    assert out["infer_int8_utt_s"] == 8770.0


def test_assemble_headlines_scanned_serving_path():
    r = _results(fused={"utt_s": 8150.0, "ms_per_batch": 7.85},
                 int8={"utt_s": 8770.0, "ms_per_batch": 7.30})
    r["infer_scan"] = {"utt_s": 9668.0, "ms_per_batch": 6.62, "scan_k": 8}
    out = bench._assemble_result(r, "tpu0")
    assert out["value"] == 9668.0 and out["serving_path"] == "int8_scan"
    assert out["infer_scan_utt_s"] == 9668.0


def test_assemble_suspect_int8_falls_back_to_next_best():
    out = bench._assemble_result(
        _results(fused={"utt_s": 8150.0, "ms_per_batch": 7.85},
                 int8={"utt_s": 70000.0, "ms_per_batch": 0.9,
                       "suspect_timing": True}), "tpu0")
    assert out["value"] == 8150.0
    assert out["serving_path"] == "fused_attn_pool"


def test_assemble_high_spread_candidate_loses_headline():
    """Headline rule (VERDICT r2 weak #4): a candidate whose own
    measurement spread exceeds the documented ~10% relay program-mix
    sensitivity cannot headline, even if its median is the fastest."""
    out = bench._assemble_result(
        _results(fused={"utt_s": 8900.0, "ms_per_batch": 7.2,
                        "spread_pct": 14.0}), "tpu0")
    assert out["value"] == 8000.0 and out["serving_path"] == "standard"
    assert "suspect_variance" not in out  # a stable candidate existed


def test_assemble_all_high_spread_flags_suspect_variance():
    r = _results()
    r["infer"]["b64"]["spread_pct"] = 12.0
    out = bench._assemble_result(r, "tpu0")
    assert out["value"] == 8000.0
    assert out["suspect_variance"] is True


def test_assemble_headlines_b128_tier_with_its_batch_size():
    """bf16_scan_b128 carries its own batch_size; when it wins, the
    headline metric string and batch_size field must reflect B=128, not
    the module default."""
    r = _results()
    r["infer_bf16_scan"] = {"utt_s": 13300.0, "ms_per_batch": 4.81,
                            "scan_k": 8, "batch_size": 64}
    r["infer_bf16_scan_b128"] = {"utt_s": 14100.0, "ms_per_batch": 9.08,
                                 "scan_k": 8, "batch_size": 128}
    out = bench._assemble_result(r, "tpu0")
    assert out["value"] == 14100.0
    assert out["serving_path"] == "bf16_scan_b128"
    assert out["batch_size"] == 128
    assert "B=128" in out["metric"]
    assert out["infer_bf16_scan_b128_utt_s"] == 14100.0
