"""Fused Pallas kernel for the Res2 64-wide conv chain (inference).

The ECAPA Bottle2neck's hierarchical section
(/root/reference/ecapa_tdnn.py:64-83; models/ecapa.py:66-80) is 7
SEQUENTIAL width-64 dilated convs, each followed by relu -> BatchNorm.
In XLA this is 21 separate kernels making 21 HBM round-trips over
(B, T, 64) activations, and the trace-based roofline puts the stage at
15% of MXU peak (docs/PERFORMANCE.md) — serial depth and launch
granularity, not arithmetic.

This kernel runs the WHOLE chain for a 2-utterance block in VMEM: one
grid step loads the (2, T, width*scale) post-1x1 activation once, runs
the 7 convs as (T, 3*width) @ (3*width, width) matmuls with the dilated
taps assembled by static-slice shifts, applies relu and the *folded*
inference BatchNorm affine (a = gamma/sqrt(var+eps), b = beta - mean*a)
between convs, and writes the concatenated (2, T, width*scale) result
once. Intermediate activations, the per-conv BN/relu passes, and the
group concat never touch HBM. Measured (v5e, device trace, B=64 T=750):
0.16 ms vs 0.43 ms for the XLA conv chain — 2.6x.

Time stays un-padded in HBM: the T dimension is covered by one ragged
Pallas block (rows past T are masked in-kernel before the first conv so
the taps see the same zeros the reference's zero-padded convs see).

Inference only (no custom VJP): the serving paths
(serving/ecapa_fused.py, serving/ecapa_int8.py) use it; training keeps
the standard autodiff graph (ops/bn_relu_vjp covers the train side).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asvspoof2021_air_tpu.models.common import BN_EPS


def _shift_rows(x, shift, t_pad):
    """x shifted along axis 0 with zero fill (y[t] = x[t - shift]).

    Static-slice + concat formulation: Mosaic's dynamic_rotate only
    handles 32-bit lanes, and the shift is a compile-time constant
    anyway."""
    zeros = jnp.zeros((abs(shift), x.shape[1]), x.dtype)
    if shift >= 0:
        return jnp.concatenate([zeros, x[:t_pad - shift]], axis=0)
    return jnp.concatenate([x[-shift:], zeros], axis=0)


def _chain_kernel(x_ref, w_ref, cb_ref, a_ref, b_ref, out_ref,
                  *, scale, width, dilation, t_valid, t_pad, block_b,
                  out_dtype):
    W = w_ref[...]                       # (scale-1, 3*width, width)
    CB, A, Bb = cb_ref[...], a_ref[...], b_ref[...]
    row = jax.lax.broadcasted_iota(jnp.int32, (t_pad, width), 0)
    valid = row < t_valid
    rows_c = jax.lax.broadcasted_iota(
        jnp.int32, (t_pad, width * scale), 0)

    for bb in range(block_b):
        # Rows past T in the ragged edge block are undefined in VMEM;
        # zero them so every conv tap reads the reference's zero padding.
        X = jnp.where(rows_c < t_valid, x_ref[bb], 0).astype(out_dtype)
        sp = None
        for i in range(scale - 1):
            g = X[:, i * width:(i + 1) * width]
            sp = g if i == 0 else (sp + g).astype(out_dtype)
            left = _shift_rows(sp, dilation, t_pad)
            right = _shift_rows(sp, -dilation, t_pad)
            x3 = jnp.concatenate([left, sp, right], axis=1)
            y = jnp.dot(x3, W[i], preferred_element_type=jnp.float32) + CB[i]
            spf = A[i] * jnp.maximum(y, 0.0) + Bb[i]
            # Zero the tail again: relu(bias)*a+b is nonzero there.
            spf = jnp.where(valid, spf, 0.0)
            sp = spf.astype(out_dtype)
            out_ref[bb, :, i * width:(i + 1) * width] = sp
        out_ref[bb, :, (scale - 1) * width:] = X[:, (scale - 1) * width:]


def fold_bn_inference(bn_params, bn_stats):
    """(a, b) of the inference BatchNorm affine y = a*x + b."""
    a = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + BN_EPS)
    return a, bn_params["bias"] - bn_stats["mean"] * a


def pack_chain_params(block_params, block_stats, scale=8):
    """Stack the chain's conv kernels/biases + folded BN affines from a
    Bottle2neck variable subtree (models/ecapa.py naming: Conv_{1..scale-1},
    BatchNorm_{1..scale-1}).

    Returns (w (scale-1, 3*width, width), cb, a, b all (scale-1, width))."""
    ws, cbs, as_, bs = [], [], [], []
    for i in range(1, scale):
        k = block_params[f"Conv_{i}"]["kernel"]        # (3, width, width)
        ws.append(k.reshape(-1, k.shape[-1]))          # taps stay ordered
        cbs.append(block_params[f"Conv_{i}"]["bias"])
        a, b = fold_bn_inference(block_params[f"BatchNorm_{i}"],
                                 block_stats[f"BatchNorm_{i}"])
        as_.append(a)
        bs.append(b)
    return (jnp.stack(ws), jnp.stack(cbs), jnp.stack(as_), jnp.stack(bs))


def res2_chain_infer(x, w, cb, a, b, *, dilation: int, scale: int = 8,
                     valid_len: int | None = None,
                     interpret: bool = False):
    """Fused inference Res2 chain: x (B, T, width*scale) -> same shape
    (groups 0..scale-2 convolved, last group passed through), matching
    models/ecapa.py:66-80 with train=False BatchNorm.

    ``w``/``cb``/``a``/``b`` come from :func:`pack_chain_params`. The
    dtype of ``x`` is the compute dtype (bf16 on TPU); BN affine and
    accumulation run f32.

    ``valid_len``: semantic sequence length when T carries alignment
    padding (rows >= valid_len are zeroed before the convs, so the
    reference's zero-padding semantics hold at the true boundary, and
    the output's padded rows are zero). Ragged edge blocks measure 2.5x
    slower than aligned DMA on v5e, so serving pads T to a multiple of 8
    and passes the true length here instead.
    """
    B, T, C = x.shape
    if valid_len is None:
        valid_len = T
    width = C // scale
    t_pad = -(-T // 8) * 8
    block_b = 2 if B % 2 == 0 else 1
    out_dtype = x.dtype

    out = pl.pallas_call(
        functools.partial(_chain_kernel, scale=scale, width=width,
                          dilation=dilation, t_valid=valid_len, t_pad=t_pad,
                          block_b=block_b, out_dtype=out_dtype),
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, t_pad, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cb.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(a.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, t_pad, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), out_dtype),
        interpret=interpret,
    )(x, w.astype(out_dtype), cb.astype(jnp.float32),
      a.astype(jnp.float32), b.astype(jnp.float32))
    return out
