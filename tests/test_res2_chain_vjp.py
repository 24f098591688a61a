"""The fused-chain custom VJP (ops/res2_chain_vjp.py) is pinned against
the standard autodiff path: same forward values, same BN batch-stat
updates, same gradients for every parameter and the input — on the
SAME parameter tree (the fused branch declares identical names/shapes,
so checkpoints/transplants are interchangeable)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asvspoof2021_air_tpu.models.ecapa import Bottle2neck


def _mk(fused_chain):
    return Bottle2neck(planes=64, kernel_size=3, dilation=2, scale=8,
                       fused_chain=fused_chain)


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 50, 64), jnp.float32)
    variables = _mk(False).init(rng, x, True)
    return x, variables


def test_same_variable_tree(setup):
    x, variables = setup
    v2 = _mk(True).init(jax.random.PRNGKey(0), x, True)
    t1 = jax.tree_util.tree_structure(variables)
    t2 = jax.tree_util.tree_structure(v2)
    assert t1 == t2
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables),
            jax.tree_util.tree_leaves_with_path(v2)):
        assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
        assert a.shape == b.shape, jax.tree_util.keystr(p1)


def test_forward_and_stats_match(setup):
    x, variables = setup
    out0, upd0 = _mk(False).apply(variables, x, True,
                                  mutable=["batch_stats"])
    out1, upd1 = _mk(True).apply(variables, x, True,
                                 mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=2e-5, atol=2e-5)
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(upd0),
            jax.tree_util.tree_leaves_with_path(upd1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(p0))


def test_gradients_match(setup):
    x, variables = setup

    def loss(params, xin, fused):
        out, _ = _mk(fused).apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xin, True, mutable=["batch_stats"])
        # mix the output nontrivially so every channel contributes
        w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
        return jnp.sum(out * jnp.sin(w * 1e-3))

    g0 = jax.grad(loss, argnums=(0, 1))(variables["params"], x, False)
    g1 = jax.grad(loss, argnums=(0, 1))(variables["params"], x, True)
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(p0))


def test_eval_path_unchanged(setup):
    """fused_chain only affects train mode; eval uses the standard path
    and running stats."""
    x, variables = setup
    e0 = _mk(False).apply(variables, x, False)
    e1 = _mk(True).apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), rtol=0,
                               atol=0)
