"""Fused attention-pooling kernel (ops/attn_pool_pallas.py) and the
serving-only fused ECAPA forward (serving/ecapa_fused.py): must match the
standard model.apply inference output (interpret mode on CPU; the real-TPU
path is measured by bench.py --stage infer_fused)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.models.ecapa import ECAPA_TDNN
from asvspoof2021_air_tpu.ops.attn_pool_pallas import fused_attention_pooling
from asvspoof2021_air_tpu.serving import ecapa_apply_fused


def test_fused_kernel_matches_reference_math():
    g = np.random.default_rng(0)
    B, T, D = 3, 50, 1536
    x = jnp.asarray(g.standard_normal((B, T, D)), jnp.float32)
    wa = jnp.asarray(0.05 * g.standard_normal((3 * D, 128)), jnp.float32)
    ba = jnp.asarray(0.01 * g.standard_normal((128,)), jnp.float32)
    bn = {"scale": jnp.asarray(1 + 0.1 * g.standard_normal((128,)),
                               jnp.float32),
          "bias": jnp.asarray(0.1 * g.standard_normal((128,)), jnp.float32),
          "mean": jnp.asarray(0.2 * g.standard_normal((128,)), jnp.float32),
          "var": jnp.asarray(1 + 0.3 * g.random((128,)), jnp.float32)}
    wb = jnp.asarray(0.05 * g.standard_normal((1, 128, D)), jnp.float32)
    bb = jnp.asarray(0.01 * g.standard_normal((D,)), jnp.float32)

    from asvspoof2021_air_tpu.models.common import BN_EPS

    def reference(x):
        mean = jnp.mean(x, axis=1)
        std = jnp.sqrt(jnp.clip(jnp.var(x, axis=1, ddof=1), 1e-4))
        const = mean @ wa[D:2 * D] + std @ wa[2 * D:]
        w = jnp.einsum("btc,cd->btd", x, wa[:D]) + const[:, None, :] + ba
        w = jax.nn.relu(w)
        w = ((w - bn["mean"]) * jax.lax.rsqrt(bn["var"] + BN_EPS)
             * bn["scale"] + bn["bias"])
        w = jnp.einsum("btc,cd->btd", w, wb[0]) + bb
        w = jax.nn.softmax(w, axis=1)
        mu = jnp.sum(x * w, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum(x ** 2 * w, axis=1) - mu ** 2, 1e-4))
        return jnp.concatenate([mu, sg], axis=1)

    want = np.asarray(reference(x))
    got = np.asarray(fused_attention_pooling(x, wa, ba, bn, wb, bb,
                                             interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("T", [48, 50])  # row-tile-aligned and padded
def test_fused_ecapa_forward_matches_model(T):
    """End-to-end serving parity: fused forward == model.apply from the
    same trained-variable tree (random init here; any module-naming drift
    in models/ecapa.py fails this loudly)."""
    B, C, scale, enc = 2, 64, 4, 32
    model = ECAPA_TDNN(C=C, model_scale=scale, n_out=2, n_feat=60,
                       enc_dim=enc)
    g = np.random.default_rng(1)
    feats = jnp.asarray(g.standard_normal((B, T, 60)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats, False)
    # randomize BN stats so folding is actually exercised
    variables = jax.tree.map(
        lambda v: v + 0.05 * jnp.asarray(
            np.random.default_rng(2).standard_normal(v.shape), v.dtype),
        variables,
    )

    want_feat, want_logits = model.apply(variables, feats, False)
    got_feat, got_logits = ecapa_apply_fused(
        variables, feats, C=C, model_scale=scale, enc_dim=enc,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_feat), np.asarray(want_feat),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits),
                               atol=3e-5, rtol=1e-4)
