"""Probe: does this TPU backend lower int8 dot_general to the int8 MXU path?

TPU v5e advertises 2x int8 throughput over bf16 (394 vs 197 TOP/s). If an
int8 (M,K)@(K,N) dot at the flagship graph's shapes beats bf16 by >=1.3x,
a quantized serving graph (int8 activations x int8 weights, int32
accumulate) is worth building; otherwise record the negative in
docs/PERFORMANCE.md and stay bf16 (weights-only int8 remains a storage
option, ops/quantize.py).

Run on TPU: python tools/perf/int8_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

import jax
import jax.numpy as jnp

# (M, K, N): the flagship graph's big matmuls at B=64, T=750
SHAPES = [
    (48000, 512, 512),    # res2 1x1 convs
    (48000, 512, 1536),   # MFA
    (48000, 1536, 128),   # attention in
]


def bench(fn, args, flops, n_iter=30):
    jitted = jax.jit(fn)
    jax.block_until_ready(jitted(*args))
    best = None
    for _ in range(5):
        t0 = time.perf_counter()
        o = None
        for _ in range(n_iter):
            o = jitted(*args)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / n_iter
        # plausibility floor: half the bf16-peak time (axon relay glitch)
        if dt >= 0.5 * flops / 394e12:
            best = dt if best is None else min(best, dt)
    return best


def main():
    g = np.random.default_rng(0)
    rows = []
    for M, K, N in SHAPES:
        x = g.standard_normal((M, K))
        w = g.standard_normal((K, N))
        flops = 2 * M * K * N

        xb = jnp.asarray(x, jnp.bfloat16)
        wb = jnp.asarray(w, jnp.bfloat16)
        x8 = jnp.asarray(np.clip(np.round(x * 20), -127, 127), jnp.int8)
        w8 = jnp.asarray(np.clip(np.round(w * 20), -127, 127), jnp.int8)

        def dot_bf16(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def dot_int8(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        t_bf16 = bench(dot_bf16, (xb, wb), flops)
        t_int8 = bench(dot_int8, (x8, w8), flops)
        # quantize-on-the-fly variant: what a serving graph actually pays
        # (dynamic per-tensor activation quant fused before the dot)
        def dot_int8_dyn(a, b8):
            s = jnp.max(jnp.abs(a)) / 127.0
            a8 = jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                a8, b8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * s

        t_dyn = bench(dot_int8_dyn, (xb.astype(jnp.float32), w8), flops)
        rows.append({
            "shape": [M, K, N],
            "bf16_ms": None if t_bf16 is None else round(t_bf16 * 1e3, 3),
            "int8_ms": None if t_int8 is None else round(t_int8 * 1e3, 3),
            "int8_dyn_ms": None if t_dyn is None else round(t_dyn * 1e3, 3),
            "speedup_int8": (None if not (t_bf16 and t_int8)
                             else round(t_bf16 / t_int8, 2)),
            "speedup_dyn": (None if not (t_bf16 and t_dyn)
                            else round(t_bf16 / t_dyn, 2)),
        })
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
