"""Weights-only int8 quantization for serving export.

The serving experiment from the round-1 perf review: ~70% of the flagship
ECAPA graph's FLOPs sit in 1x1 convs / dense layers whose weights can be
stored int8 with per-output-channel scales. The compute stays in
bf16/f32 — XLA fuses the dequantize (convert + scale) into the matmul's
weight read — so the win, if any, is HBM traffic and artifact size, not
MXU throughput. docs/PERFORMANCE.md records the measured result.

Scheme: symmetric per-output-channel (last kernel axis) int8:
  w_q = round(w / s),  s = max|w_over_channel| / 127.
Leaves smaller than 1024 elements or non-matmul-shaped (ndim < 2: biases,
BN scales) stay f32 — a rounding error of the byte budget.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def quantize_tree_int8(params) -> Dict[str, Any]:
    """Flatten `params`; quantize eligible leaves. Returns a pytree-free
    record: {'leaves': [('q', int8, f32_scale) | ('f', f32)], 'treedef'}."""
    flat, treedef = jax.tree_util.tree_flatten(params)
    leaves: List[Tuple] = []
    for leaf in flat:
        arr = np.asarray(leaf)
        if arr.ndim >= 2 and arr.size >= 1024:
            s = np.max(np.abs(arr), axis=tuple(range(arr.ndim - 1)),
                       keepdims=True) / 127.0
            s = np.where(s == 0, 1.0, s).astype(np.float32)
            q = np.clip(np.round(arr / s), -127, 127).astype(np.int8)
            leaves.append(("q", q, s))
        else:
            leaves.append(("f", arr.astype(np.float32)))
    return {"leaves": leaves, "treedef": treedef}


def dequantize_tree(qt: Dict[str, Any], dtype=jnp.float32):
    """Rebuild the params tree; traced inside the serving fn so XLA fuses
    the int8->float convert + scale into each consumer matmul."""
    rebuilt = []
    for rec in qt["leaves"]:
        if rec[0] == "q":
            _, q, s = rec
            rebuilt.append(jnp.asarray(q).astype(dtype) *
                           jnp.asarray(s, dtype))
        else:
            rebuilt.append(jnp.asarray(rec[1], dtype))
    return jax.tree_util.tree_unflatten(qt["treedef"], rebuilt)


def quantized_bytes(qt: Dict[str, Any]) -> Tuple[int, int]:
    """(bytes with int8 weights, bytes at full f32) for reporting."""
    qb = fb = 0
    for rec in qt["leaves"]:
        if rec[0] == "q":
            qb += rec[1].size + rec[2].size * 4
            fb += rec[1].size * 4
        else:
            qb += rec[1].size * 4
            fb += rec[1].size * 4
    return qb, fb
