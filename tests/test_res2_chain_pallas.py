"""Fused Res2 chain kernel (ops/res2_chain_pallas.py) vs the model's
standard chain math, incl. the aligned-T padding mode the int8 serving
path uses (interpret mode on CPU; real-TPU throughput in bench.py)."""

import flax
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.models.common import BN_EPS
from asvspoof2021_air_tpu.models.ecapa import Bottle2neck
from asvspoof2021_air_tpu.ops.attn_pool_pallas import fused_attention_pooling
from asvspoof2021_air_tpu.ops.res2_chain_pallas import (
    pack_chain_params,
    res2_chain_infer,
)

SCALE = 8
C = 512


def _block_vars(dilation, seed=0):
    """Bottle2neck variables with non-trivial BN statistics."""
    x0 = jnp.zeros((1, 16, C), jnp.float32)
    blk = Bottle2neck(planes=C, dilation=dilation, scale=SCALE)
    vars_ = blk.init(jax.random.PRNGKey(seed), x0)
    bs = flax.core.unfreeze(vars_["batch_stats"])

    def perturb(d):
        for k, v in d.items():
            if isinstance(v, dict):
                perturb(v)
            elif k == "mean":
                d[k] = v + 0.1
            elif k == "var":
                d[k] = v * 0.0 + 0.7
    perturb(bs)
    return vars_["params"], bs


def _ref_chain(p, bs, x, dilation):
    """The model's chain section (models/ecapa.py:66-80), inference BN."""
    groups = jnp.split(x, SCALE, axis=-1)
    outs, sp = [], None
    for i in range(SCALE - 1):
        sp = groups[i] if i == 0 else sp + groups[i]
        k = p[f"Conv_{i + 1}"]["kernel"]
        sp = jax.lax.conv_general_dilated(
            sp, k, (1,), [(dilation, dilation)], rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + p[f"Conv_{i + 1}"]["bias"]
        sp = jax.nn.relu(sp)
        bn_p, bn_s = p[f"BatchNorm_{i + 1}"], bs[f"BatchNorm_{i + 1}"]
        inv = bn_p["scale"] / jnp.sqrt(bn_s["var"] + BN_EPS)
        sp = sp * inv + (bn_p["bias"] - bn_s["mean"] * inv)
        outs.append(sp)
    outs.append(groups[-1])
    return jnp.concatenate(outs, axis=-1)


@pytest.mark.parametrize("B,T,dilation", [(2, 97, 3), (4, 96, 4), (3, 50, 2)])
def test_chain_matches_model_math(B, T, dilation):
    p, bs = _block_vars(dilation, seed=B)
    g = np.random.default_rng(B * T)
    x = jnp.asarray(g.standard_normal((B, T, C)).astype(np.float32))
    ref = _ref_chain(p, bs, x, dilation)
    w, cb, a, b = pack_chain_params(p, bs, scale=SCALE)
    out = res2_chain_infer(x, w, cb, a, b, dilation=dilation, scale=SCALE,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_valid_len_padding_mode_matches_unpadded():
    """The serving mode: x padded to a multiple of 8 with GARBAGE rows
    past valid_len must produce the unpadded result on the valid rows
    and exact zeros on the padded rows."""
    B, T, dilation = 2, 45, 3
    t_phys = 48
    p, bs = _block_vars(dilation, seed=7)
    g = np.random.default_rng(9)
    x = jnp.asarray(g.standard_normal((B, T, C)).astype(np.float32))
    w, cb, a, b = pack_chain_params(p, bs, scale=SCALE)
    want = res2_chain_infer(x, w, cb, a, b, dilation=dilation, scale=SCALE,
                            interpret=True)

    garbage = jnp.asarray(
        g.standard_normal((B, t_phys - T, C)).astype(np.float32)) * 5.0
    xp = jnp.concatenate([x, garbage], axis=1)
    got = res2_chain_infer(xp, w, cb, a, b, dilation=dilation, scale=SCALE,
                           valid_len=T, interpret=True)
    np.testing.assert_allclose(np.asarray(got[:, :T]), np.asarray(want),
                               atol=1e-4)
    # convolved groups are zeroed past valid_len; the pass-through group
    # is zeroed by the input mask
    np.testing.assert_array_equal(np.asarray(got[:, T:]), 0.0)


def test_attention_pooling_valid_len_masks_padding():
    """fused_attention_pooling(valid_len=T) over a padded (B, Tpad, D)
    input with garbage pad rows == pooling over the unpadded input."""
    B, T, D = 2, 21, 1536
    t_phys = 24
    g = np.random.default_rng(3)
    x = jnp.asarray(np.abs(g.standard_normal((B, T, D))).astype(np.float32))
    attn_kernel = jnp.asarray(
        (g.standard_normal((3 * D, 128)) * 0.02).astype(np.float32))
    attn_bias = jnp.asarray(g.standard_normal((128,)).astype(np.float32))
    bn_vars = {
        "scale": jnp.ones((128,)), "bias": jnp.zeros((128,)),
        "mean": jnp.zeros((128,)) + 0.05, "var": jnp.ones((128,)) * 0.9,
    }
    conv_kernel = jnp.asarray(
        (g.standard_normal((128, D)) * 0.05).astype(np.float32))
    conv_bias = jnp.asarray(g.standard_normal((D,)).astype(np.float32))

    want = fused_attention_pooling(x, attn_kernel, attn_bias, bn_vars,
                                   conv_kernel, conv_bias, interpret=True)
    garbage = jnp.asarray(
        g.standard_normal((B, t_phys - T, D)).astype(np.float32)) * 7.0
    xp = jnp.concatenate([x, garbage], axis=1)
    got = fused_attention_pooling(xp, attn_kernel, attn_bias, bn_vars,
                                  conv_kernel, conv_bias, interpret=True,
                                  valid_len=T)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
