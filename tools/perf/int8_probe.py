"""Probe: does this TPU backend lower int8 dot_general to the int8 MXU path?

TPU v5e advertises 2x int8 throughput over bf16 (394 vs 197 TOP/s). If an
int8 (M,K)@(K,N) dot at the flagship graph's shapes beats bf16 by >=1.3x,
a quantized serving graph (int8 activations x int8 weights, int32
accumulate) is worth building; otherwise record the negative in
docs/PERFORMANCE.md and stay bf16 (weights-only int8 remains a storage
option, ops/quantize.py).

Timing uses the roofline module's glitch-guarded measurement (duration-
scaled loops + per-dtype physical plausibility floors). On the axon relay
run `--isolated` — one (shape, impl) program per process — for numbers
that aren't poisoned by executable-cache thrash.

Run on TPU: python tools/perf/int8_probe.py --isolated
"""

import argparse
import importlib.util
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

import jax
import jax.numpy as jnp

_spec = importlib.util.spec_from_file_location(
    "roofline", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "roofline.py"))
roofline = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("roofline", roofline)
_spec.loader.exec_module(roofline)

PEAK_TOPS = {"bf16": 197e12, "int8": 394e12}

# (M, K, N): the flagship graph's big matmuls at B=64, T=750
SHAPES = [
    (48000, 512, 512),    # res2 1x1 convs
    (48000, 512, 1536),   # MFA
    (48000, 1536, 128),   # attention in
]
IMPLS = ("bf16", "int8", "int8_dyn")


def _build(case, impl):
    """(fn, args, flops, peak) for one (shape, impl) measurement."""
    M, K, N = SHAPES[case]
    g = np.random.default_rng(0)
    x = g.standard_normal((M, K))
    w = g.standard_normal((K, N))
    flops = 2 * M * K * N
    x8 = jnp.asarray(np.clip(np.round(x * 20), -127, 127), jnp.int8)
    w8 = jnp.asarray(np.clip(np.round(w * 20), -127, 127), jnp.int8)

    if impl == "bf16":
        def fn(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return fn, (jnp.asarray(x, jnp.bfloat16),
                    jnp.asarray(w, jnp.bfloat16)), flops, PEAK_TOPS["bf16"]
    if impl == "int8":
        def fn(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        return fn, (x8, w8), flops, PEAK_TOPS["int8"]
    # quantize-on-the-fly variant: what a serving graph actually pays
    # (dynamic per-tensor activation quant fused before the dot)
    def fn(a, b8):
        s = jnp.max(jnp.abs(a)) / 127.0
        a8 = jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            a8, b8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * s
    return fn, (jnp.asarray(x, jnp.float32), w8), flops, PEAK_TOPS["int8"]


def _measure_one(case, impl):
    fn, args, flops, peak = _build(case, impl)
    dt, suspect = roofline.measure(fn, args, flops=flops,
                                   peak_tflops=peak / 1e12)
    row = {"case": case, "impl": impl, "ms": round(dt * 1e3, 3)}
    if suspect:
        row["suspect_timing"] = True
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--case", type=int, default=None)
    p.add_argument("--impl", choices=IMPLS, default=None)
    p.add_argument("--isolated", action="store_true")
    args = p.parse_args()

    if args.case is not None:
        print(json.dumps(_measure_one(args.case, args.impl)))
        return

    cells = {}
    for case in range(len(SHAPES)):
        for impl in IMPLS:
            if args.isolated:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--case", str(case), "--impl", impl],
                    capture_output=True, text=True, timeout=600)
                if proc.returncode != 0:
                    cells[case, impl] = {"error":
                                         proc.stderr.strip().splitlines()[-1:]}
                    continue
                cells[case, impl] = json.loads(
                    proc.stdout.strip().splitlines()[-1])
            else:
                cells[case, impl] = _measure_one(case, impl)

    rows = []
    for case, shape in enumerate(SHAPES):
        def ms(impl):
            c = cells[case, impl]
            return None if ("error" in c or c.get("suspect_timing")) \
                else c["ms"]
        b, i8, dyn = ms("bf16"), ms("int8"), ms("int8_dyn")
        rows.append({
            "shape": list(shape),
            "bf16_ms": b, "int8_ms": i8, "int8_dyn_ms": dyn,
            "speedup_int8": round(b / i8, 2) if b and i8 else None,
            "speedup_dyn": round(b / dyn, 2) if b and dyn else None,
            "suspect_cells": [impl for impl in IMPLS
                              if cells[case, impl].get("suspect_timing")
                              or "error" in cells[case, impl]],
        })
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
