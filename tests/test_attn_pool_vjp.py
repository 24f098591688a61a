"""Differentiable fused attentive-stats pooling (ops/attn_pool_vjp.py):
forward values and every cotangent must match the plain JAX formulation
the model otherwise uses (softmax over T of a 1x1 conv, then weighted
first/second moments). Runs the Pallas kernels in interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.ops.attn_pool_vjp import fused_softmax_stats


def ref_stats(x, h2, w2, b2):
    logits = h2.astype(jnp.float32) @ w2 + b2
    w = jax.nn.softmax(logits, axis=1)
    xf = x.astype(jnp.float32)
    mu = jnp.sum(xf * w, axis=1)
    e2 = jnp.sum(xf * xf * w, axis=1)
    return mu, e2


def _inputs(B=2, T=30, D=512, H=128, seed=0, dtype=jnp.float32):
    g = np.random.default_rng(seed)
    x = jnp.asarray(g.standard_normal((B, T, D)), dtype)
    h2 = jnp.asarray(g.standard_normal((B, T, H)) * 0.5, dtype)
    w2 = jnp.asarray(g.standard_normal((H, D)) * 0.2, jnp.float32)
    b2 = jnp.asarray(g.standard_normal((D,)) * 0.1, jnp.float32)
    return x, h2, w2, b2


@pytest.mark.parametrize("D", [512, 1024])
def test_forward_matches_reference(D):
    x, h2, w2, b2 = _inputs(D=D)
    mu, e2 = fused_softmax_stats(True, x, h2, w2, b2)
    rmu, re2 = ref_stats(x, h2, w2, b2)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(rmu),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(re2),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    x, h2, w2, b2 = _inputs(T=29)  # non-multiple-of-8 exercises padding
    g = np.random.default_rng(5)
    # fixed projection so the scalar loss exercises both outputs
    pm = jnp.asarray(g.standard_normal(x.shape[::2][::-1][-1:]  # (B,)
                                       ), jnp.float32)
    cm = jnp.asarray(g.standard_normal((x.shape[-1],)), jnp.float32)

    def loss(fn, x, h2, w2, b2):
        mu, e2 = fn(x, h2, w2, b2)
        sg = jnp.sqrt(jnp.clip(e2 - mu ** 2, 1e-4))
        return jnp.sum((mu * 0.7 + sg) * cm)

    fused = lambda *a: fused_softmax_stats(True, *a)
    want = jax.grad(lambda *a: loss(ref_stats, *a),
                    argnums=(0, 1, 2, 3))(x, h2, w2, b2)
    got = jax.grad(lambda *a: loss(fused, *a),
                   argnums=(0, 1, 2, 3))(x, h2, w2, b2)

    for name, w, gt in zip(("dx", "dh2", "dw2", "db2"), want, got):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(w),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_bias_gradient_is_exactly_zero():
    """Softmax over T cancels the per-channel conv bias, so db2 == 0 —
    the fused rule returns exact zeros; the reference autodiff agrees to
    rounding."""
    x, h2, w2, b2 = _inputs(T=16)

    def loss(fn, b2):
        mu, e2 = fn(x, h2, w2, b2)
        return jnp.sum(mu) + jnp.sum(e2)

    db_fused = jax.grad(
        lambda b: loss(lambda *a: fused_softmax_stats(True, *a), b))(b2)
    db_ref = jax.grad(lambda b: loss(ref_stats, b))(b2)
    assert np.all(np.asarray(db_fused) == 0.0)
    np.testing.assert_allclose(np.asarray(db_ref), 0.0, atol=1e-5)


def test_model_fused_pool_matches_standard_forward_and_grads():
    """ECAPA_TDNN(fused_pool=True) must share the exact parameter tree
    with the standard model and produce matching outputs/gradients in
    both train and eval modes."""
    from asvspoof2021_air_tpu.models.ecapa import ECAPA_TDNN

    g = np.random.default_rng(11)
    # batch 8, not 2: train-mode BatchNorm over a degenerate 2-sample
    # batch has near-zero variance for features where the samples tie,
    # and (x-mean)/sqrt(var+eps) then amplifies benign conv-vs-dot
    # summation-order noise (~1e-6) by ~1/sqrt(eps), swamping any real
    # comparison. With 8 samples the variances are well-conditioned.
    feats = jnp.asarray(g.standard_normal((8, 40, 60)), jnp.float32)
    std = ECAPA_TDNN(C=32, model_scale=4, n_out=2, n_feat=60, enc_dim=16)
    fus = ECAPA_TDNN(C=32, model_scale=4, n_out=2, n_feat=60, enc_dim=16,
                     fused_pool=True, pool_interpret=True)
    v_std = std.init({"params": jax.random.PRNGKey(0)}, feats, False)
    v_fus = fus.init({"params": jax.random.PRNGKey(0)}, feats, False)
    assert jax.tree_util.tree_structure(v_std) \
        == jax.tree_util.tree_structure(v_fus)
    # same seed + same tree -> identical initial params
    for a, b in zip(jax.tree_util.tree_leaves(v_std),
                    jax.tree_util.tree_leaves(v_fus)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    for train in (False, True):
        out_s = std.apply(v_std, feats, train,
                          mutable=["batch_stats"] if train else False)
        out_f = fus.apply(v_std, feats, train,
                          mutable=["batch_stats"] if train else False)
        (es, ls), (ef, lf) = (out_s[0], out_f[0]) if train \
            else (out_s, out_f)
        tol = dict(rtol=5e-4, atol=5e-4) if train \
            else dict(rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ef), np.asarray(es), **tol)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(ls), **tol)
        if train:  # BN stat updates must agree too
            for a, b in zip(jax.tree_util.tree_leaves(out_s[1]),
                            jax.tree_util.tree_leaves(out_f[1])):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           rtol=1e-4, atol=1e-5)

    def loss(model, params):
        (emb, logits), _ = model.apply(
            {"params": params, "batch_stats": v_std["batch_stats"]},
            feats, True, mutable=["batch_stats"])
        return jnp.sum(emb ** 2) + jnp.sum(logits ** 2)

    gs = jax.grad(lambda p: loss(std, p))(v_std["params"])
    gf = jax.grad(lambda p: loss(fus, p))(v_std["params"])
    flat_s = jax.tree_util.tree_leaves_with_path(gs)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gf)}
    for k, v in flat_s:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_f[key]), np.asarray(v),
            rtol=5e-3, atol=2e-4, err_msg=key)


def test_bf16_inputs_track_f32_reference():
    x, h2, w2, b2 = _inputs(T=24, dtype=jnp.bfloat16)
    mu, e2 = fused_softmax_stats(True, x, h2, w2, b2)
    rmu, re2 = ref_stats(x.astype(jnp.float32), h2.astype(jnp.float32),
                         w2, b2)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(rmu),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(re2),
                               rtol=2e-2, atol=2e-2)
    # cotangents come back in the primal dtypes
    grads = jax.grad(lambda x_, h_: float(0) + jnp.sum(
        fused_softmax_stats(True, x_, h_, w2, b2)[0]), argnums=(0, 1))(x, h2)
    assert grads[0].dtype == jnp.bfloat16
    assert grads[1].dtype == jnp.bfloat16
