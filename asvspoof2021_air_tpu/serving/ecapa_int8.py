"""Int8-quantized ECAPA serving forward (framework-original).

The reference serves float32 torch graphs
(/root/reference/generate_score.py:38-119);
this path targets the TPU v5e MXU's 2x int8 throughput (394 vs 197
TOP/s): the matmul-dominant stages — the res2 1x1 convs (32% of graph
FLOPs) and the MFA projection (48%) — run as int8 x int8 -> int32 dots
with per-output-channel symmetric weight scales and per-tensor dynamic
activation scales, while everything range-sensitive or FLOP-light (stem,
64-wide chains, SE gates, attention, pooling, head) stays in bf16/f32.

Weights are quantized INSIDE the jitted graph from the ordinary float
variables tree (one (K, N) elementwise pass per layer, amortized to
noise next to the (B*T, K, N) dot), so this function serves the exact
checkpoint a trained ECAPA_TDNN produced — no separate quantized
artifact needed. `ops/quantize.py` remains the storage-size story;
this module is the compute story.

Accuracy: embedding cosine vs the f32 graph is pinned by
tests/test_ecapa_int8.py. Throughput: measured either way in
docs/PERFORMANCE.md ("int8 serving" experiment).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.models.common import BN_EPS
from asvspoof2021_air_tpu.ops.attn_pool_pallas import fused_attention_pooling
from asvspoof2021_air_tpu.ops.res2_chain_pallas import (
    pack_chain_params,
    res2_chain_infer,
)
from asvspoof2021_air_tpu.serving.ecapa_fused import _Head


def _bn_inf(p, bs, x, dtype):
    """Inference BatchNorm from params/batch_stats subtrees."""
    inv = p["scale"] / jnp.sqrt(bs["var"] + BN_EPS)
    return x * inv.astype(dtype) + (p["bias"] - bs["mean"] * inv).astype(dtype)


def _quant_w(w):
    """Per-output-channel symmetric int8 weight quantization.

    w: (K, N) float -> (int8 (K, N), f32 scale (N,)); computed in-graph,
    constant-foldable when weights are donated/closed over."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
    return jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8), s


def _qdot(x, w8, ws, dtype, act_scale=None):
    """x (..., K) float @ int8 weights -> dtype, int32 accumulation.

    Without ``act_scale`` the activation scale is per-tensor and dynamic
    (one max-reduce pass per call); with a static calibrated scale
    (see calibrate_act_scales) the max-reduce disappears and XLA can
    fuse the quantize into the producing op. The quant math runs in f32
    so bf16 inputs don't double-round."""
    xf = x.astype(jnp.float32)
    if act_scale is None:
        s = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    else:
        s = jnp.asarray(act_scale, jnp.float32)
    x8 = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x8, w8, (((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(dtype) * (s * ws).astype(dtype)


def _conv1d(x, kernel, bias, dtype, *, pad, dilation=1):
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(dtype), (1,), [(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    return out + bias.astype(dtype)


def _block_int8(p, bs, x, dilation, dtype, scale=8, name="b",
                act_scales=None, observer=None, fused_chain=False,
                interpret=False, valid_len=None, quantize=True):
    """Bottle2neck (models/ecapa.py:27-68) with int8 1x1 convs
    (``quantize=False`` keeps the 1x1s in the compute dtype — the bf16
    serving tier with the same fused kernels).

    ``valid_len``: semantic T when x carries alignment padding (the
    fused-chain serving mode runs the trunk at T padded to a multiple of
    8; see ecapa_apply_int8). Padded rows hold garbage from the
    pointwise stages — every cross-time op here (chain convs, SE mean)
    masks or corrects for them exactly."""
    T = x.shape[1]
    t_sem = valid_len if valid_len is not None else T

    def site_scale(site, v):
        if observer is not None:
            observer(site, v)
        return None if act_scales is None else act_scales[site]

    def dot_1x1(v, w, site):
        if quantize is True:
            w8, ws = _quant_w(w)
            return _qdot(v, w8, ws, dtype, act_scale=site_scale(site, v))
        return jax.lax.dot_general(
            v.astype(dtype), w.astype(dtype),
            (((v.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)

    residual = x
    out = dot_1x1(x, p["Conv_0"]["kernel"][0], f"{name}_in") \
        + p["Conv_0"]["bias"].astype(dtype)
    out = jax.nn.relu(out)
    out = _bn_inf(p["BatchNorm_0"], bs["BatchNorm_0"], out, dtype)

    if fused_chain:
        # Whole 7-conv hierarchical chain + relu/BN in one VMEM-resident
        # Pallas kernel (ops/res2_chain_pallas.py): 0.16 vs 0.43 ms
        # device at the flagship shapes (aligned T). The kernel zeroes
        # rows >= valid_len before its convs, so the true-boundary
        # zero-padding semantics hold.
        cw, ccb, ca, cb_ = pack_chain_params(p, bs, scale=scale)
        out = res2_chain_infer(out, cw, ccb, ca, cb_, dilation=dilation,
                               scale=scale, valid_len=t_sem,
                               interpret=interpret)
    else:
        groups = jnp.split(out, scale, axis=-1)
        outs, sp = [], None
        for i in range(scale - 1):
            sp = groups[i] if i == 0 else sp + groups[i]
            sp = _conv1d(sp, p[f"Conv_{i + 1}"]["kernel"],
                         p[f"Conv_{i + 1}"]["bias"], dtype,
                         pad=dilation, dilation=dilation)
            sp = jax.nn.relu(sp)
            sp = _bn_inf(p[f"BatchNorm_{i + 1}"], bs[f"BatchNorm_{i + 1}"],
                         sp, dtype)
            outs.append(sp)
        outs.append(groups[-1])
        out = jnp.concatenate(outs, axis=-1)

    out = dot_1x1(out, p[f"Conv_{scale}"]["kernel"][0], f"{name}_out") \
        + p[f"Conv_{scale}"]["bias"].astype(dtype)
    out = jax.nn.relu(out)
    out = _bn_inf(p[f"BatchNorm_{scale}"], bs[f"BatchNorm_{scale}"],
                  out, dtype)

    se_p, se_bs = p["SEModule1D_0"], bs["SEModule1D_0"]
    if t_sem != T:
        # Masked SE mean: subtract the padded rows' pointwise-stage
        # values from the full sum — exact, no full-width mask pass.
        y = (jnp.sum(out, axis=1) - jnp.sum(out[:, t_sem:], axis=1)) \
            / jnp.asarray(t_sem, dtype)
    else:
        y = jnp.mean(out, axis=1)
    y = y @ se_p["Dense_0"]["kernel"].astype(dtype) \
        + se_p["Dense_0"]["bias"].astype(dtype)
    y = jax.nn.relu(y)
    y = _bn_inf(se_p["BatchNorm_0"], se_bs["BatchNorm_0"], y, dtype)
    y = y @ se_p["Dense_1"]["kernel"].astype(dtype) \
        + se_p["Dense_1"]["bias"].astype(dtype)
    y = jax.nn.sigmoid(y)
    return out * y[:, None, :] + residual


def ecapa_apply_int8(variables, feats, *, model_scale: int = 8,
                     enc_dim: int = 256, n_out: int = 2,
                     dtype=jnp.bfloat16, interpret: bool = False,
                     act_scales=None, observer=None,
                     fused_chain: bool = False, quantize: bool = True):
    """(embedding, logits) for ECAPA inference with int8 matmul compute,
    from the SAME variables tree a trained ECAPA_TDNN produced.

    Mirrors serving/ecapa_fused.ecapa_apply_fused (fused Pallas
    attention-pooling middle section) with the trunk's 1x1/MFA matmuls
    quantized. Module-name aliasing against models/ecapa.py is pinned by
    tests/test_ecapa_int8.py.

    ``act_scales``: optional dict of static per-site activation scales
    from calibrate_act_scales — removes every dynamic max-reduce pass.
    ``observer``: internal hook used by calibration (called with
    (site_name, activation) before each quantized dot).
    ``fused_chain``: run each block's 7-conv hierarchical chain as one
    VMEM-resident Pallas kernel (ops/res2_chain_pallas.py). The trunk
    then runs at T padded to a multiple of 8 (aligned-DMA blocks; the
    zero-padded feature rows reproduce the reference convs' zero padding
    exactly, and every cross-time statistic masks the pad — chain
    kernel, SE mean, attention pooling).
    ``quantize=False``: keep every matmul in the compute dtype — the
    bf16 serving tier with the same fused kernels and graph shape.
    ``quantize="mfa"``: int8 ONLY on the MFA projection (48% of graph
    FLOPs, the single biggest stage at 80% of bf16 peak) while the
    range-cheaper 1x1 convs stay bf16 — a mixed tier probing whether
    the full-int8 path's loss to bf16 was the 1x1s' quantize-pass
    overhead rather than the MFA's."""
    p, bs = variables["params"], variables["batch_stats"]
    t_sem = feats.shape[1]
    valid_len = None
    if fused_chain:
        t_phys = -(-t_sem // 8) * 8
        if t_phys != t_sem:
            feats = jnp.pad(feats, ((0, 0), (0, t_phys - t_sem), (0, 0)))
            valid_len = t_sem
    x = _conv1d(feats.astype(dtype), p["Conv_0"]["kernel"],
                p["Conv_0"]["bias"], dtype, pad=2)
    x = jax.nn.relu(x)
    x = _bn_inf(p["BatchNorm_0"], bs["BatchNorm_0"], x, dtype)

    qkw = {"act_scales": act_scales, "observer": observer,
           "fused_chain": fused_chain, "interpret": interpret,
           "valid_len": valid_len, "quantize": quantize}
    x1 = _block_int8(p["Bottle2neck_0"], bs["Bottle2neck_0"], x, 2, dtype,
                     scale=model_scale, name="b0", **qkw)
    x2 = _block_int8(p["Bottle2neck_1"], bs["Bottle2neck_1"], x1, 3, dtype,
                     scale=model_scale, name="b1", **qkw)
    x3 = _block_int8(p["Bottle2neck_2"], bs["Bottle2neck_2"], x2, 4, dtype,
                     scale=model_scale, name="b2", **qkw)

    # MFA as three int8 dots (each slice gets its own activation scale);
    # the (B, T, 3C) concat never materializes (models/ecapa.py:109-123)
    C = x1.shape[-1]
    w4 = p["mfa_kernel"]
    acc = None
    for i, (xi, sl) in enumerate(((x1, slice(0, C)), (x2, slice(C, 2 * C)),
                                  (x3, slice(2 * C, 3 * C)))):
        if observer is not None:
            observer(f"mfa_{i}", xi)
        if quantize in (True, "mfa"):
            w8, ws = _quant_w(w4[sl])
            term = _qdot(xi, w8, ws, dtype,
                         act_scale=None if act_scales is None
                         else act_scales[f"mfa_{i}"])
        else:
            term = jax.lax.dot_general(
                xi, w4[sl].astype(dtype),
                (((xi.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dtype)
        acc = term if acc is None else acc + term
    x = jax.nn.relu(acc + p["mfa_bias"].astype(dtype))

    bn_vars = {
        "scale": p["BatchNorm_1"]["scale"],
        "bias": p["BatchNorm_1"]["bias"],
        "mean": bs["BatchNorm_1"]["mean"],
        "var": bs["BatchNorm_1"]["var"],
    }
    pooled = fused_attention_pooling(
        x, p["attn_kernel"], p["attn_bias"], bn_vars,
        p["Conv_1"]["kernel"], p["Conv_1"]["bias"], interpret=interpret,
        valid_len=valid_len)
    head = _Head(enc_dim=enc_dim, n_out=n_out, dtype=dtype)
    return head.apply(variables, pooled)


def calibrate_act_scales(variables, feats_batches, *, model_scale: int = 8,
                         enc_dim: int = 256, n_out: int = 2,
                         dtype=jnp.float32, interpret: bool = False,
                         headroom: float = 1.0):
    """Static per-site activation scales for ecapa_apply_int8.

    Runs the quantized forward over the calibration batches recording
    max|activation| at every quantized-dot site; returns
    {site: max_abs * headroom / 127}. Passing the result as
    ``act_scales`` removes the per-layer dynamic max-reduce HBM pass and
    lets XLA fuse quantization into the producing op; activations beyond
    the calibrated range saturate at ±127 (use headroom > 1 for slack).
    """
    maxima = {}

    def observer(site, v):
        m = float(jnp.max(jnp.abs(v.astype(jnp.float32))))
        maxima[site] = max(maxima.get(site, 0.0), m)

    for feats in feats_batches:
        ecapa_apply_int8(variables, feats, model_scale=model_scale,
                         enc_dim=enc_dim, n_out=n_out, dtype=dtype,
                         interpret=interpret, observer=observer)
    return {site: max(m, 1e-12) * headroom / 127.0
            for site, m in maxima.items()}
