"""Model shape/contract tests: every model takes (B, T, F) features and
returns an (embedding, logits) 2-tuple, matching the reference shapes
(e.g. /root/reference/model.py:1025-1031, ecapa_tdnn.py:200-203)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.models import (
    ECAPA_TDNN,
    LCNN,
    ChannelClassifier,
    ConvNet,
    RawNet,
    ResNet,
    SERes2Net50,
    Subband,
    build_model,
    gradient_reversal,
)

B, T, F = 2, 750, 60


@pytest.fixture(scope="module")
def feats():
    g = np.random.default_rng(688)
    return jnp.asarray(g.standard_normal((B, T, F)), dtype=jnp.float32)


def _init_and_apply(model, x, train=False, extra_rngs=None):
    rngs = {"params": jax.random.PRNGKey(0)}
    if extra_rngs:
        rngs.update(extra_rngs)
    variables = model.init(rngs, x, train)
    out = model.apply(variables, x, train,
                      rngs=extra_rngs if extra_rngs else None,
                      mutable=["batch_stats"] if train else False)
    if train:
        out = out[0]
    return variables, out


def test_resnet18_shapes(feats):
    model = ResNet(num_nodes=3, enc_dim=256, resnet_type="18", nclasses=2)
    _, (feat, mu) = _init_and_apply(model, feats)
    assert feat.shape == (B, 256)
    assert mu.shape == (B, 2)


def test_lcnn_shapes(feats):
    model = LCNN(num_nodes=60, enc_dim=256, nclasses=2)
    _, (feat, out) = _init_and_apply(model, feats)
    assert feat.shape == (B, 256)
    assert out.shape == (B, 2)


def test_ecapa_shapes(feats):
    model = ECAPA_TDNN(C=512, model_scale=8, n_out=2, n_feat=60)
    variables, (feat, out) = _init_and_apply(model, feats)
    assert feat.shape == (B, 256)
    assert out.shape == (B, 2)
    # Parameter count sanity: the reference ECAPA-512 is ~ 7M params.
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert 5e6 < n_params < 9e6, n_params


def test_res2net_shapes(feats):
    model = SERes2Net50(num_classes=2)
    _, (feat, out) = _init_and_apply(model, feats)
    assert feat.shape == (B, 256)
    assert out.shape == (B, 2)
    # log-probs sum to 1 in prob space
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, atol=1e-5)


def test_convnet_shapes(feats):
    model = ConvNet(num_classes=2, enc_dim=256, subband_attention=True,
                    num_nodes=6)
    _, (feat, out) = _init_and_apply(model, feats)
    assert feat.shape == (B, 256)
    assert out.shape == (B, 2)


def test_subband(feats):
    model = Subband(num_nodes=60, enc_dim=256, num_classes=2, subband_num=2)
    _, bands = _init_and_apply(model, feats)
    assert len(bands) == 2
    assert bands[0].shape == (B, 128)
    assert sum(b.shape[1] for b in bands) == 256


def test_rawnet_shapes():
    g = np.random.default_rng(1)
    wav = jnp.asarray(g.standard_normal((2, 16000)), dtype=jnp.float32)
    model = RawNet()
    _, (pre, logp) = _init_and_apply(model, wav)
    assert pre.shape == (2, 2)
    assert logp.shape == (2, 2)
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0, atol=1e-5)


def test_registry_builds():
    for name in ("resnet", "lcnn", "ecapa", "res2net", "cnn"):
        model = build_model(name, enc_dim=256, nclasses=2, feat_dim=60)
        assert model is not None


def test_gradient_reversal():
    def f(x):
        return jnp.sum(gradient_reversal(x, 0.05) ** 2)

    x = jnp.ones((4,))
    g = jax.grad(f)(x)
    # forward identity, backward scaled by -lambda
    np.testing.assert_allclose(np.asarray(g), -0.05 * 2.0 * np.ones(4), atol=1e-6)


def test_channel_classifier(feats):
    clf = ChannelClassifier(enc_dim=256, nclasses=60, lambda_=0.05)
    x = jnp.ones((B, 256))
    variables = clf.init(jax.random.PRNGKey(0), x, False)
    out = clf.apply(variables, x, False)
    assert out.shape == (B, 60)
    assert np.all(np.asarray(out) >= 0)  # final ReLU


def test_train_mode_updates_batch_stats(feats):
    model = ECAPA_TDNN(C=64, model_scale=4, n_out=2, n_feat=60)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats, True)
    (feat, out), mutated = model.apply(
        variables, feats, True, mutable=["batch_stats"]
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )


def test_ecapa_bf16_compute(feats):
    """bf16 compute dtype keeps f32 params and returns f32 outputs close to
    the f32 path."""
    m32 = ECAPA_TDNN(C=64, model_scale=4, n_out=2, n_feat=F)
    m16 = ECAPA_TDNN(C=64, model_scale=4, n_out=2, n_feat=F,
                     dtype=jnp.bfloat16)
    variables = m32.init({"params": jax.random.PRNGKey(0)}, feats, False)
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(variables["params"]))
    f32_out = m32.apply(variables, feats, False)
    f16_out = m16.apply(variables, feats, False)
    assert f16_out[0].dtype == jnp.float32
    a, b = np.asarray(f32_out[0]), np.asarray(f16_out[0])
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    assert cos.min() > 0.99, cos.min()


def test_rawnet_fft_frontend_matches_time_domain():
    """The FFT sinc front-end (rawnet.sinc_conv_fft) is the frequency-
    domain identity of the VALID time-domain correlation; whole-model
    outputs must agree between the two forms."""
    import jax

    from asvspoof2021_air_tpu.models.rawnet import (
        RawNet,
        sinc_conv_fft,
        sinc_filterbank,
    )

    g = np.random.default_rng(3)
    x = jnp.asarray(g.standard_normal((2, 64600, 1)), jnp.float32)
    bank = sinc_filterbank(20, 1024)
    y_fft = sinc_conv_fft(x, bank)
    y_conv = jax.lax.conv_general_dilated(
        x, jnp.asarray(bank), window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))
    np.testing.assert_allclose(np.asarray(y_fft), np.asarray(y_conv),
                               rtol=1e-4, atol=1e-5)

    d = {"nb_samp": 6000, "first_conv": 256, "in_channels": 1,
         "filts": [8, [8, 8], [8, 16], [16, 16]], "blocks": [2, 4],
         "nb_fc_node": 16, "gru_node": 16, "nb_gru_layer": 1,
         "nb_classes": 2}
    wav = jnp.asarray(g.standard_normal((2, 6000)), jnp.float32)
    m_fft = RawNet(d_args=d)
    m_td = RawNet(d_args=d, fft_frontend=False)
    v = m_fft.init({"params": jax.random.PRNGKey(0)}, wav, False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        m_td.init({"params": jax.random.PRNGKey(0)}, wav, False))
    (p_f, s_f) = m_fft.apply(v, wav, False)
    (p_t, s_t) = m_td.apply(v, wav, False)
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_t),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_t),
                               rtol=1e-4, atol=1e-4)
