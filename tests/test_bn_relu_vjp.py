"""Recompute-VJP fused ReLU+BatchNorm (ops/bn_relu_vjp, common.BatchNorm):
the drop-in BatchNorm must match flax.linen.BatchNorm exactly, and the
fused train path must match the standard relu->bn formulation in values,
every cotangent, and running-stat updates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from asvspoof2021_air_tpu.models.common import (
    BN_EPS,
    BN_MOMENTUM,
    BatchNorm,
    relu_bn,
)
from asvspoof2021_air_tpu.ops.bn_relu_vjp import relu_bn_train


def _x(shape=(4, 12, 24), seed=0, dtype=jnp.float32):
    g = np.random.default_rng(seed)
    return jnp.asarray(g.standard_normal(shape), dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize("shape", [(4, 12, 24), (8, 16)])
def test_batchnorm_matches_flax(dtype, train, shape):
    """common.BatchNorm is bit-compatible with nn.BatchNorm: same variable
    tree, same outputs, same batch_stats updates."""
    x = _x(shape, dtype=dtype)
    mdtype = dtype if dtype == jnp.bfloat16 else None
    ours = BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                     epsilon=BN_EPS, dtype=mdtype)
    ref = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                       epsilon=BN_EPS, dtype=mdtype)
    v_ours = ours.init(jax.random.PRNGKey(0), x)
    v_ref = ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_ours) \
        == jax.tree_util.tree_structure(v_ref)
    # perturb params/stats so the comparison isn't at the trivial point
    g = np.random.default_rng(3)
    v = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(0.1 * g.standard_normal(a.shape),
                                  a.dtype) + 0.5, v_ref)
    kw = dict(mutable=["batch_stats"]) if train else dict(mutable=False)
    out_o = ours.apply(v, x, **kw)
    out_r = ref.apply(v, x, **kw)
    y_o, y_r = (out_o[0], out_r[0]) if train else (out_o, out_r)
    assert y_o.dtype == y_r.dtype
    np.testing.assert_array_equal(np.asarray(y_o), np.asarray(y_r))
    if train:
        for a, b in zip(jax.tree_util.tree_leaves(out_o[1]),
                        jax.tree_util.tree_leaves(out_r[1])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batchnorm_no_scale_bias_matches_flax():
    x = _x((5, 7, 16))
    ours = BatchNorm(use_running_average=False, use_scale=False,
                     use_bias=False)
    ref = nn.BatchNorm(use_running_average=False, use_scale=False,
                       use_bias=False)
    v_o = ours.init(jax.random.PRNGKey(0), x)
    v_r = ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_o) \
        == jax.tree_util.tree_structure(v_r)
    (y_o, _), (y_r, _) = (ours.apply(v_o, x, mutable=["batch_stats"]),
                          ref.apply(v_r, x, mutable=["batch_stats"]))
    np.testing.assert_array_equal(np.asarray(y_o), np.asarray(y_r))


def _std_relu_bn(x, scale, bias, eps):
    axes = tuple(range(x.ndim - 1))
    r = jax.nn.relu(x).astype(jnp.float32)
    mu = jnp.mean(r, axis=axes)
    var = jnp.maximum(0.0, jnp.mean(r * r, axis=axes) - mu * mu)
    return (r - mu) * (jax.lax.rsqrt(var + eps) * scale) + bias, mu, var


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_relu_bn_train_matches_standard(dtype):
    x = _x((4, 30, 48), dtype=dtype, seed=2)
    g = np.random.default_rng(1)
    scale = jnp.asarray(1.0 + 0.2 * g.standard_normal(48), jnp.float32)
    bias = jnp.asarray(0.1 * g.standard_normal(48), jnp.float32)

    got = relu_bn_train(x, scale, bias, BN_EPS)
    want = _std_relu_bn(x, scale, bias, BN_EPS)
    for name, a, b in zip(("y", "mu", "var"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)

    cm = jnp.asarray(g.standard_normal(48), jnp.float32)

    def loss(fn, x, scale, bias):
        y, mu, var = fn(x, scale, bias, BN_EPS)
        # exercise y and (unusually) the stat outputs too, so the bwd
        # rule's gmu/gvar terms are covered
        return jnp.sum(y ** 2 * cm) + jnp.sum(mu * cm) + 0.5 * jnp.sum(var)

    gf = jax.grad(lambda *a: loss(relu_bn_train, *a), argnums=(0, 1, 2))(
        x, scale, bias)
    gs = jax.grad(lambda *a: loss(_std_relu_bn, *a), argnums=(0, 1, 2))(
        x, scale, bias)
    tol = 1e-4 if dtype == jnp.float32 else 5e-2
    for name, a, b in zip(("dx", "dscale", "dbias"), gf, gs):
        np.testing.assert_allclose(np.asarray(a).astype(np.float32),
                                   np.asarray(b).astype(np.float32),
                                   rtol=tol, atol=tol, err_msg=name)


def test_relu_bn_helper_tree_and_values():
    """relu_bn(fused=True) and relu_bn(fused=False) share the variable
    tree and agree in train and eval modes."""

    class M(nn.Module):
        fused: bool

        @nn.compact
        def __call__(self, x, train=False):
            return relu_bn(x, train, fused=self.fused)

    x = _x((6, 20, 32), seed=5)
    std, fus = M(fused=False), M(fused=True)
    v_s = std.init(jax.random.PRNGKey(0), x)
    v_f = fus.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_s) \
        == jax.tree_util.tree_structure(v_f)
    for train in (False, True):
        kw = dict(mutable=["batch_stats"]) if train else dict(mutable=False)
        o_s = std.apply(v_s, x, train, **kw)
        o_f = fus.apply(v_s, x, train, **kw)
        y_s, y_f = (o_s[0], o_f[0]) if train else (o_s, o_f)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_s),
                                   rtol=1e-6, atol=1e-6)
        if train:
            for a, b in zip(jax.tree_util.tree_leaves(o_s[1]),
                            jax.tree_util.tree_leaves(o_f[1])):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           rtol=1e-6, atol=1e-6)


def test_model_fused_bn_matches_standard():
    """ECAPA_TDNN(fused_bn=True): same tree, same outputs/grads/BN stats
    as the standard model."""
    from asvspoof2021_air_tpu.models.ecapa import ECAPA_TDNN

    g = np.random.default_rng(11)
    feats = jnp.asarray(g.standard_normal((8, 40, 60)), jnp.float32)
    std = ECAPA_TDNN(C=32, model_scale=4, n_out=2, n_feat=60, enc_dim=16)
    fus = ECAPA_TDNN(C=32, model_scale=4, n_out=2, n_feat=60, enc_dim=16,
                     fused_bn=True)
    v_std = std.init({"params": jax.random.PRNGKey(0)}, feats, False)
    v_fus = fus.init({"params": jax.random.PRNGKey(0)}, feats, False)
    assert jax.tree_util.tree_structure(v_std) \
        == jax.tree_util.tree_structure(v_fus)
    for a, b in zip(jax.tree_util.tree_leaves(v_std),
                    jax.tree_util.tree_leaves(v_fus)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    for train in (False, True):
        kw = dict(mutable=["batch_stats"]) if train else dict(mutable=False)
        out_s = std.apply(v_std, feats, train, **kw)
        out_f = fus.apply(v_std, feats, train, **kw)
        (es, ls), (ef, lf) = (out_s[0], out_f[0]) if train else (out_s, out_f)
        np.testing.assert_allclose(np.asarray(ef), np.asarray(es),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(ls),
                                   rtol=5e-4, atol=5e-4)
        if train:
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
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gf)}
    for k, v in jax.tree_util.tree_leaves_with_path(gs):
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_f[key]), np.asarray(v),
            rtol=5e-3, atol=5e-4, err_msg=key)


def _std_bn_relu(x, scale, bias, eps):
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=axes)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=axes) - mu * mu)
    z = (xf - mu) * (jax.lax.rsqrt(var + eps) * scale) + bias
    return jax.nn.relu(z), mu, var


def test_bn_relu_train_matches_standard():
    from asvspoof2021_air_tpu.ops.bn_relu_vjp import bn_relu_train

    x = _x((3, 6, 10, 20), seed=4)  # NHWC rank-4 like the 2D models
    g = np.random.default_rng(2)
    scale = jnp.asarray(1.0 + 0.2 * g.standard_normal(20), jnp.float32)
    bias = jnp.asarray(0.1 * g.standard_normal(20), jnp.float32)

    got = bn_relu_train(x, scale, bias, BN_EPS)
    want = _std_bn_relu(x, scale, bias, BN_EPS)
    for name, a, b in zip(("y", "mu", "var"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)

    cm = jnp.asarray(g.standard_normal(20), jnp.float32)

    def loss(fn, x, scale, bias):
        y, mu, var = fn(x, scale, bias, BN_EPS)
        return jnp.sum(y ** 2 * cm) + jnp.sum(mu * cm) + 0.5 * jnp.sum(var)

    gf = jax.grad(lambda *a: loss(bn_relu_train, *a), argnums=(0, 1, 2))(
        x, scale, bias)
    gs = jax.grad(lambda *a: loss(_std_bn_relu, *a), argnums=(0, 1, 2))(
        x, scale, bias)
    for name, a, b in zip(("dx", "dscale", "dbias"), gf, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


@pytest.mark.parametrize("family", ["resnet", "res2net"])
def test_preact_models_fused_bn_match_standard(family):
    """ResNet / SERes2Net50 with fused_bn=True: same tree, same
    outputs/grads/BN stats as the standard path."""
    from asvspoof2021_air_tpu.models.res2net import SERes2Net50
    from asvspoof2021_air_tpu.models.resnet import ResNet

    g = np.random.default_rng(9)
    feats = jnp.asarray(g.standard_normal((4, 48, 60)), jnp.float32)
    if family == "resnet":
        mk = lambda fused: ResNet(num_nodes=3, enc_dim=16,
                                  resnet_type="18", fused_bn=fused)
    else:
        mk = lambda fused: SERes2Net50(num_classes=2, layers=(1, 1, 1, 1),
                                       fused_bn=fused)
    std, fus = mk(False), mk(True)
    v_std = std.init({"params": jax.random.PRNGKey(0)}, feats, False)
    v_fus = fus.init({"params": jax.random.PRNGKey(0)}, feats, False)
    assert jax.tree_util.tree_structure(v_std) \
        == jax.tree_util.tree_structure(v_fus)

    for train in (False, True):
        kw = dict(mutable=["batch_stats"]) if train else dict(mutable=False)
        out_s = std.apply(v_std, feats, train, **kw)
        out_f = fus.apply(v_std, feats, train, **kw)
        (es, ls), (ef, lf) = (out_s[0], out_f[0]) if train else (out_s, out_f)
        np.testing.assert_allclose(np.asarray(ef), np.asarray(es),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(ls),
                                   rtol=5e-4, atol=5e-4)
        if train:
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
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gf)}
    for k, v in jax.tree_util.tree_leaves_with_path(gs):
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_f[key]), np.asarray(v),
            rtol=5e-3, atol=5e-4, err_msg=key)


def test_fused_bn_sharded_train_step_matches_standard():
    """Under GSPMD data sharding the standard BN computes GLOBAL batch
    stats; the recompute-VJP path must too (its jnp reductions get the
    same collectives inserted). Two optimizer steps on an 8-device
    sharded batch must track the unfused model."""
    from asvspoof2021_air_tpu.losses import build_loss
    from asvspoof2021_air_tpu.models.ecapa import ECAPA_TDNN
    from asvspoof2021_air_tpu.parallel import make_mesh, shard_batch
    from asvspoof2021_air_tpu.train.state import (
        create_train_state,
        make_backbone_optimizer,
        make_loss_optimizer,
        step_decay_schedule,
    )
    from asvspoof2021_air_tpu.train.steps import StepConfig, make_train_step

    B, T, F, ENC = 16, 50, 60, 16
    g = np.random.default_rng(0)
    labels = g.integers(0, 2, B).astype(np.int32)
    feats = (g.standard_normal((B, T, F)) + labels[:, None, None]).astype(
        np.float32)
    mesh = make_mesh()
    batch = shard_batch({"feat": feats, "label": labels}, mesh)

    losses = {}
    params = {}
    for fused in (False, True):
        model = ECAPA_TDNN(C=32, model_scale=4, n_out=2, n_feat=F,
                           enc_dim=ENC, fused_bn=fused)
        loss_mod = build_loss("ang_iso", enc_dim=ENC)
        sched = step_decay_schedule(5e-4, 0.5, 30, steps_per_epoch=10)
        btx, ltx = make_backbone_optimizer(sched), make_loss_optimizer(sched)
        state = create_train_state(
            jax.random.PRNGKey(688), model, jnp.zeros((B, T, F), jnp.float32),
            loss_module=loss_mod, example_feat=jnp.zeros((B, ENC)),
            example_labels=jnp.zeros((B,), jnp.int32),
            backbone_tx=btx, loss_tx=ltx,
        )
        step = jax.jit(make_train_step(model, loss_mod, btx, ltx,
                                       StepConfig(add_loss="ang_iso")))
        ls = []
        for i in range(2):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            ls.append(float(metrics["total_loss"]))
        losses[fused] = ls
        params[fused] = state.params

    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params[False]),
                    jax.tree_util.tree_leaves(params[True])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)


def test_model_both_fusions_match_standard():
    """fused_pool + fused_bn together (the TPU training configuration)
    must still match the standard model in values and gradients."""
    from asvspoof2021_air_tpu.models.ecapa import ECAPA_TDNN

    g = np.random.default_rng(13)
    feats = jnp.asarray(g.standard_normal((8, 40, 60)), jnp.float32)
    std = ECAPA_TDNN(C=32, model_scale=4, n_out=2, n_feat=60, enc_dim=16)
    fus = ECAPA_TDNN(C=32, model_scale=4, n_out=2, n_feat=60, enc_dim=16,
                     fused_pool=True, pool_interpret=True, fused_bn=True)
    v = std.init({"params": jax.random.PRNGKey(0)}, feats, False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        fus.init({"params": jax.random.PRNGKey(0)}, feats, False))

    (es, ls), aux_s = std.apply(v, feats, True, mutable=["batch_stats"])
    (ef, lf), aux_f = fus.apply(v, feats, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ef), np.asarray(es),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(ls),
                               rtol=5e-4, atol=5e-4)

    def loss(model, params):
        (emb, logits), _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            feats, True, mutable=["batch_stats"])
        return jnp.sum(emb ** 2) + jnp.sum(logits ** 2)

    gs = jax.grad(lambda p: loss(std, p))(v["params"])
    gf = jax.grad(lambda p: loss(fus, p))(v["params"])
    flat_f = {jax.tree_util.keystr(k): w
              for k, w in jax.tree_util.tree_leaves_with_path(gf)}
    for k, w in jax.tree_util.tree_leaves_with_path(gs):
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_f[key]), np.asarray(w),
            rtol=5e-3, atol=5e-4, err_msg=key)


def test_lcnn_fused_bn_matches_standard():
    """LCNN(fused_bn=True) — plain recompute BN, affine-free — matches the
    standard model in values, gradients and BN stat updates."""
    from asvspoof2021_air_tpu.models.lcnn import LCNN

    g = np.random.default_rng(7)
    feats = jnp.asarray(g.standard_normal((4, 48, 60)), jnp.float32)
    mk = lambda fused: LCNN(num_nodes=60, enc_dim=16, feat_len=48,
                            fused_bn=fused)
    std, fus = mk(False), mk(True)
    v = std.init({"params": jax.random.PRNGKey(0)}, feats, False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        fus.init({"params": jax.random.PRNGKey(0)}, feats, False))

    for train in (False, True):
        kw = dict(mutable=["batch_stats"]) if train else dict(mutable=False)
        rngs = {"dropout": jax.random.PRNGKey(1)} if train else None
        out_s = std.apply(v, feats, train, rngs=rngs, **kw)
        out_f = fus.apply(v, feats, train, rngs=rngs, **kw)
        (es, ls), (ef, lf) = (out_s[0], out_f[0]) if train else (out_s, out_f)
        np.testing.assert_allclose(np.asarray(ef), np.asarray(es),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(ls),
                                   rtol=5e-4, atol=5e-4)
        if train:
            for a, b in zip(jax.tree_util.tree_leaves(out_s[1]),
                            jax.tree_util.tree_leaves(out_f[1])):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           rtol=1e-4, atol=1e-5)

    def loss(model, params):
        (emb, logits), _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            feats, True, rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        return jnp.sum(emb ** 2) + jnp.sum(logits ** 2)

    gs = jax.grad(lambda p: loss(std, p))(v["params"])
    gf = jax.grad(lambda p: loss(fus, p))(v["params"])
    flat_f = {jax.tree_util.keystr(k): w
              for k, w in jax.tree_util.tree_leaves_with_path(gf)}
    for k, w in jax.tree_util.tree_leaves_with_path(gs):
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_f[key]), np.asarray(w),
            rtol=5e-3, atol=2e-3, err_msg=key)


def test_convnet_fused_bn_matches_standard():
    """ConvNet(fused_bn=True) — recompute BN + leaky ReLU 0.1 — matches
    the standard model in values, gradients and BN stat updates."""
    from asvspoof2021_air_tpu.models.convnet import ConvNet

    g = np.random.default_rng(15)
    feats = jnp.asarray(g.standard_normal((4, 48, 60)), jnp.float32)
    mk = lambda fused: ConvNet(num_classes=2, enc_dim=16,
                               subband_attention=True, num_nodes=6,
                               fused_bn=fused)
    std, fus = mk(False), mk(True)
    v = std.init({"params": jax.random.PRNGKey(0)}, feats, False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        fus.init({"params": jax.random.PRNGKey(0)}, feats, False))

    for train in (False, True):
        kw = dict(mutable=["batch_stats"]) if train else dict(mutable=False)
        out_s = std.apply(v, feats, train, **kw)
        out_f = fus.apply(v, feats, train, **kw)
        (es, ls), (ef, lf) = (out_s[0], out_f[0]) if train else (out_s, out_f)
        np.testing.assert_allclose(np.asarray(ef), np.asarray(es),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(ls),
                                   rtol=5e-4, atol=5e-4)
        if train:
            for a, b in zip(jax.tree_util.tree_leaves(out_s[1]),
                            jax.tree_util.tree_leaves(out_f[1])):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           rtol=1e-4, atol=1e-5)

    def loss(model, params):
        (emb, logits), _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            feats, True, mutable=["batch_stats"])
        return jnp.sum(emb ** 2) + jnp.sum(logits ** 2)

    gs = jax.grad(lambda p: loss(std, p))(v["params"])
    gf = jax.grad(lambda p: loss(fus, p))(v["params"])
    flat_f = {jax.tree_util.keystr(k): w
              for k, w in jax.tree_util.tree_leaves_with_path(gf)}
    for k, w in jax.tree_util.tree_leaves_with_path(gs):
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_f[key]), np.asarray(w),
            rtol=5e-3, atol=2e-3, err_msg=key)


def test_fused_kernels_under_member_vmap():
    """--ensemble N vmaps the whole step over a stacked member axis; the
    fused pooling Pallas kernel and the recompute-VJP BNs must batch
    correctly (member 0 of the vmapped grads == the solo grads)."""
    from asvspoof2021_air_tpu.models.ecapa import ECAPA_TDNN

    g = np.random.default_rng(1)
    feats = jnp.asarray(g.standard_normal((2, 8, 24, 60)), jnp.float32)
    model = ECAPA_TDNN(C=16, model_scale=4, n_out=2, n_feat=60, enc_dim=8,
                       fused_pool=True, pool_interpret=True, fused_bn=True)
    vs = [model.init({"params": jax.random.PRNGKey(i)}, feats[0], False)
          for i in range(2)]
    stacked = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *vs)

    def loss(params, bs, x):
        (emb, logits), _ = model.apply(
            {"params": params, "batch_stats": bs}, x, True,
            mutable=["batch_stats"])
        return jnp.sum(emb ** 2) + jnp.sum(logits ** 2)

    gl = jax.vmap(jax.grad(loss), in_axes=(0, 0, 0))(
        stacked["params"], stacked["batch_stats"], feats)
    solo = jax.grad(loss)(vs[0]["params"], vs[0]["batch_stats"], feats[0])
    for a, b in zip(jax.tree_util.tree_leaves(gl),
                    jax.tree_util.tree_leaves(solo)):
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)
