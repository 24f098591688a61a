"""Loss semantics tests against independently computed values."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.losses import (
    AMSoftmax,
    AngularIsoLoss,
    CenterLoss,
    IsolateLoss,
    IsolateSquareLoss,
    OCSoftmax,
    P2SGradLoss,
    binary_cross_entropy_with_logits,
    build_loss,
    cross_entropy,
    focal_loss,
)

KEY = jax.random.PRNGKey(688)


@pytest.fixture(scope="module")
def feats_labels():
    g = np.random.default_rng(688)
    feats = jnp.asarray(g.standard_normal((32, 16)), dtype=jnp.float32)
    labels = jnp.asarray([0] * 10 + [1] * 22, dtype=jnp.int32)
    return feats, labels


def test_ocsoftmax_values(feats_labels):
    feats, labels = feats_labels
    loss_mod = OCSoftmax(feat_dim=16, r_real=0.9, r_fake=0.2, alpha=20.0)
    variables = loss_mod.init(KEY, feats, labels)
    loss, scores = loss_mod.apply(variables, feats, labels)

    # independent numpy computation
    center = np.asarray(variables["params"]["center"])
    w = center / np.linalg.norm(center)
    x = np.asarray(feats)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    cos = (xn @ w.T)[:, 0]
    lab = np.asarray(labels)
    margins = np.where(lab == 0, 0.9 - cos, cos - 0.2)
    expected = np.mean(np.log1p(np.exp(20.0 * margins)))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    # score output is the NEGATED cosine (/root/reference/loss.py:97)
    np.testing.assert_allclose(np.asarray(scores), -cos, atol=1e-6)


def test_angular_iso_is_ocsoftmax(feats_labels):
    feats, labels = feats_labels
    a = AngularIsoLoss(feat_dim=16)
    b = OCSoftmax(feat_dim=16)
    va = a.init(KEY, feats, labels)
    la, sa = a.apply(va, feats, labels)
    lb, sb = b.apply(va, feats, labels)
    np.testing.assert_allclose(float(la), float(lb))
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb))


def test_isolate_loss(feats_labels):
    feats, labels = feats_labels
    mod = IsolateLoss(feat_dim=16, r_real=0.042, r_fake=1.638)
    variables = mod.init(KEY, feats, labels)
    loss = mod.apply(variables, feats, labels)

    center = np.asarray(variables["params"]["center"])
    x, lab = np.asarray(feats), np.asarray(labels)
    d = np.linalg.norm(x - center, axis=1)
    expected = np.maximum(d[lab == 0] - 0.042, 0).mean() + \
        np.maximum(1.638 - d[lab == 1], 0).mean()
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)

    score = mod.score(variables, feats)
    np.testing.assert_allclose(np.asarray(score), d, rtol=1e-5)


def test_isolate_square_loss(feats_labels):
    feats, labels = feats_labels
    mod = IsolateSquareLoss(feat_dim=16, r_real=0.5, r_fake=2.0)
    variables = mod.init(KEY, feats, labels)
    loss = mod.apply(variables, feats, labels)
    center = np.asarray(variables["params"]["center"])
    x, lab = np.asarray(feats), np.asarray(labels)
    sq = ((x - center) ** 2).sum(1)
    expected = np.maximum(sq[lab == 0] - 0.25, 0).mean() + \
        np.maximum(4.0 - sq[lab == 1], 0).mean()
    np.testing.assert_allclose(float(loss), expected, rtol=2e-5)


def test_p2sgrad(feats_labels):
    feats, labels = feats_labels
    mod = P2SGradLoss(in_dim=16, out_dim=2, smooth=0.0)
    variables = mod.init(KEY, feats, labels)
    loss, score = mod.apply(variables, feats, labels)

    w = np.asarray(variables["params"]["weight"])
    w = w / np.linalg.norm(w, axis=0, keepdims=True)
    x, lab = np.asarray(feats), np.asarray(labels)
    cos = np.clip((x @ w) / np.linalg.norm(x, axis=1, keepdims=True), -1, 1)
    onehot = np.eye(2)[lab]
    np.testing.assert_allclose(float(loss), ((cos - onehot) ** 2).mean(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(score), -cos[:, 0], atol=1e-6)


def test_amsoftmax(feats_labels):
    feats, labels = feats_labels
    mod = AMSoftmax(num_classes=2, enc_dim=16, s=20, m=0.9)
    variables = mod.init(KEY, feats, labels)
    logits, mlogits = mod.apply(variables, feats, labels)
    assert logits.shape == (32, 2)
    lab = np.asarray(labels)
    diff = np.asarray(logits) - np.asarray(mlogits) / 20.0
    np.testing.assert_allclose(diff[np.arange(32), lab], 0.9, atol=1e-5)
    np.testing.assert_allclose(diff[np.arange(32), 1 - lab], 0.0, atol=1e-5)


def test_cross_entropy_matches_torch_semantics(feats_labels):
    g = np.random.default_rng(0)
    logits = g.standard_normal((8, 2)).astype(np.float32)
    labels = np.array([0, 1] * 4)
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    p = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    expected = -np.log(p[np.arange(8), labels]).mean()
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_bce(feats_labels):
    logits = jnp.asarray([2.0, -1.0, 0.0])
    labels = jnp.asarray([1.0, 0.0, 1.0])
    ours = float(binary_cross_entropy_with_logits(logits, labels))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    expected = -(np.asarray(labels) * np.log(p) + (1 - np.asarray(labels)) * np.log(1 - p)).mean()
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_focal_gamma0_equals_ce(feats_labels):
    g = np.random.default_rng(0)
    logits = jnp.asarray(g.standard_normal((8, 2)), dtype=jnp.float32)
    labels = jnp.asarray([0, 1] * 4)
    np.testing.assert_allclose(
        float(focal_loss(logits, labels, gamma=0.0)),
        float(cross_entropy(logits, labels)),
        rtol=1e-5,
    )


def test_center_loss_gradients(feats_labels):
    feats, labels = feats_labels
    mod = CenterLoss(num_classes=2, feat_dim=16)
    variables = mod.init(KEY, feats, labels)

    def loss_fn(params, f):
        return mod.apply({"params": params}, f, labels)

    val = loss_fn(variables["params"], feats)
    centers = np.asarray(variables["params"]["centers"])
    x, lab = np.asarray(feats), np.asarray(labels)
    expected_val = 0.5 * ((x - centers[lab]) ** 2).sum()
    np.testing.assert_allclose(float(val), expected_val, rtol=1e-4)

    gc = jax.grad(loss_fn)(variables["params"], feats)["centers"]
    counts = np.array([(lab == 0).sum(), (lab == 1).sum()]) + 1.0
    expected_gc = np.stack([
        (centers[0] - x[lab == 0]).sum(0) / counts[0],
        (centers[1] - x[lab == 1]).sum(0) / counts[1],
    ])
    np.testing.assert_allclose(np.asarray(gc), expected_gc, rtol=1e-4)

    gf = jax.grad(loss_fn, argnums=1)(variables["params"], feats)
    np.testing.assert_allclose(np.asarray(gf), x - centers[lab], rtol=1e-4)


def test_loss_registry():
    for name in ("ang_iso", "ocsoftmax", "isolate", "iso_sq", "p2sgrad", "amsoftmax"):
        assert build_loss(name, enc_dim=8) is not None
    assert build_loss(None) is None
    assert build_loss("None") is None
