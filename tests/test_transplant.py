"""Weight-transplant architecture-parity tests.

Build the torch reference model (source mounted read-only at
/root/reference), randomly initialize, port its state_dict into the flax
model via interop.torch_port, and assert (embedding, logits) agree in eval
mode — the strongest data-free proof the architectures match
(/root/reference/ecapa_tdnn.py:152-198, model.py:184-253, :555-610).
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

# The reference imports pytorch_model_summary at module scope (only used in
# __main__ demo blocks); stub it so the mounted source imports cleanly.
sys.modules.setdefault(
    "pytorch_model_summary", types.SimpleNamespace(summary=lambda *a, **k: "")
)
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

ref_ecapa = pytest.importorskip("ecapa_tdnn")
ref_model = pytest.importorskip("model")

from asvspoof2021_air_tpu.interop import (  # noqa: E402
    port_ecapa,
    port_lcnn,
    port_resnet,
)
from asvspoof2021_air_tpu.models.ecapa import ECAPA_TDNN  # noqa: E402
from asvspoof2021_air_tpu.models.lcnn import LCNN  # noqa: E402
from asvspoof2021_air_tpu.models.resnet import ResNet  # noqa: E402


def _state_dict_np(mod):
    return {k: v.detach().cpu().numpy() for k, v in mod.state_dict().items()}


def _randomize_bn_stats(mod, seed=0):
    """Give running stats non-default values so stat transplanting is
    actually exercised."""
    g = torch.Generator().manual_seed(seed)
    for m in mod.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.uniform_(-0.05, 0.05, generator=g)
            m.running_var.uniform_(0.9, 1.1, generator=g)


@pytest.mark.parametrize("scale,C", [(4, 64), (8, 128)])
def test_ecapa_transplant(scale, C):
    torch.manual_seed(688)
    ref = ref_ecapa.Res2Net2(
        ref_ecapa.Bottle2neck, C=C, model_scale=scale, nOut=2, n_mels=60
    )
    _randomize_bn_stats(ref)
    ref.eval()

    B, T = 3, 50
    g = np.random.default_rng(0)
    x = g.standard_normal((B, 60, T)).astype(np.float32)
    with torch.no_grad():
        t_feat, t_logits = ref(torch.from_numpy(x))

    model = ECAPA_TDNN(C=C, model_scale=scale, n_out=2, n_feat=60, enc_dim=256)
    variables = port_ecapa(_state_dict_np(ref), model_scale=scale)
    j_feat, j_logits = jax.jit(
        lambda v, a: model.apply(v, a, False)
    )(jax.tree.map(jnp.asarray, variables), jnp.asarray(x.transpose(0, 2, 1)))

    np.testing.assert_allclose(np.asarray(j_feat), t_feat.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               atol=2e-3, rtol=1e-3)


def test_resnet18_transplant():
    torch.manual_seed(42)
    ref = ref_model.ResNet(3, 256, resnet_type="18", nclasses=2)
    _randomize_bn_stats(ref, seed=1)
    ref.eval()

    B, T = 2, 100
    g = np.random.default_rng(1)
    x = g.standard_normal((B, 1, 60, T)).astype(np.float32)
    with torch.no_grad():
        torch.manual_seed(7)  # the reference adds 1e-5 noise in the pooling
        t_feat, t_logits = ref(torch.from_numpy(x))

    model = ResNet(num_nodes=3, enc_dim=256, resnet_type="18", nclasses=2)
    variables = port_resnet(_state_dict_np(ref), resnet_type="18")
    j_feat, j_logits = jax.jit(
        lambda v, a: model.apply(v, a, False)
    )(
        jax.tree.map(jnp.asarray, variables),
        jnp.asarray(x[:, 0].transpose(0, 2, 1)),  # (B, T, F)
    )
    # 1e-5 pooling noise in the torch path bounds achievable tolerance
    np.testing.assert_allclose(np.asarray(j_feat), t_feat.numpy(),
                               atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               atol=5e-3, rtol=1e-2)


def test_lcnn_transplant():
    torch.manual_seed(9)
    feat_len = 112
    ref = ref_model.LCNN(60, 256, nclasses=2)
    # resize the reference's feat_len-750 head to the test length
    in_dim = (feat_len // 16) * (60 // 16) * 32
    ref.out[1] = torch.nn.Linear(in_dim, 160)
    _randomize_bn_stats(ref, seed=2)
    ref.eval()

    B = 2
    g = np.random.default_rng(2)
    x = g.standard_normal((B, 1, 60, feat_len)).astype(np.float32)
    with torch.no_grad():
        t_feat, t_logits = ref(torch.from_numpy(x))

    model = LCNN(num_nodes=60, enc_dim=256, nclasses=2, feat_len=feat_len)
    variables = port_lcnn(_state_dict_np(ref), num_nodes=60, feat_len=feat_len)
    j_feat, j_logits = jax.jit(
        lambda v, a: model.apply(v, a, False)
    )(
        jax.tree.map(jnp.asarray, variables),
        jnp.asarray(x[:, 0].transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(np.asarray(j_feat), t_feat.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               atol=2e-3, rtol=1e-3)


def test_se_res2net50_transplant():
    """SE-Res2Net50: the reference's `-m res2net` path crashes on a missing
    math import (/root/reference/model.py:412); inject it and transplant.
    Note torch.split with width*scale < conv1-out would break — widths here
    match the reference construction exactly."""
    ref_model.math = __import__("math")  # fix the reference's latent bug

    torch.manual_seed(11)
    ref = ref_model.se_res2net50_v1b(num_classes=2)
    _randomize_bn_stats(ref, seed=3)
    ref.eval()

    B, T = 2, 64
    g = np.random.default_rng(3)
    x = g.standard_normal((B, 1, 60, T)).astype(np.float32)
    with torch.no_grad():
        t_feat, t_logits = ref(torch.from_numpy(x))

    from asvspoof2021_air_tpu.interop import port_se_res2net50
    from asvspoof2021_air_tpu.models.res2net import SERes2Net50

    model = SERes2Net50(num_classes=2)
    variables = port_se_res2net50(_state_dict_np(ref))
    j_feat, j_logits = jax.jit(
        lambda v, a: model.apply(v, a, False)
    )(
        jax.tree.map(jnp.asarray, variables),
        jnp.asarray(x[:, 0].transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(np.asarray(j_feat), t_feat.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               atol=2e-3, rtol=1e-3)


def test_channel_classifier_transplant_forward_and_grl_gradient():
    """GRL classifier: transplanted outputs match, AND the gradient that
    flows back through the gradient-reversal layer matches torch's
    (forward identity, backward x -lambda — /root/reference/model.py:984-994)."""
    torch.manual_seed(5)
    lam = 0.05
    ref = ref_model.ChannelClassifier(64, 7, torch.tensor(lam))
    ref.eval()

    from asvspoof2021_air_tpu.interop import port_channel_classifier
    from asvspoof2021_air_tpu.models.classifier import ChannelClassifier

    model = ChannelClassifier(enc_dim=64, nclasses=7, lambda_=lam)
    variables = port_channel_classifier(_state_dict_np(ref))

    g = np.random.default_rng(5)
    x = g.standard_normal((4, 64)).astype(np.float32)

    tx = torch.from_numpy(x).requires_grad_(True)
    t_out = ref(tx)
    t_out.sum().backward()
    t_grad = tx.grad.numpy()

    def forward_sum(inp):
        return model.apply(
            jax.tree.map(jnp.asarray, variables), inp, False
        ).sum()

    j_out = model.apply(jax.tree.map(jnp.asarray, variables),
                        jnp.asarray(x), False)
    j_grad = jax.grad(forward_sum)(jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(j_out), t_out.detach().numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_grad), t_grad, atol=1e-5)
    # the GRL actually reverses: gradient through it is negative-scaled
    assert np.sign(np.asarray(j_grad)).sum() != 0  # nontrivial


def test_rawnet_transplant():
    """RawNet2 (/root/reference/model.py:765-893): sinc front-end, FMS
    residual blocks, and the 3-layer GRU head transplant exactly — incl.
    torch's GRU gate math with both bias vectors, which flax's own GRUCell
    cannot represent (its input-side candidate gate is bias-free)."""
    from asvspoof2021_air_tpu.interop import port_rawnet
    from asvspoof2021_air_tpu.models.rawnet import RawNet

    d_args = {
        "nb_samp": 12000,
        "first_conv": 257,
        "in_channels": 1,
        "filts": [8, [8, 8], [8, 24], [24, 24]],
        "blocks": [2, 4],
        "nb_fc_node": 32,
        "gru_node": 16,
        "nb_gru_layer": 3,
        "nb_classes": 2,
    }
    torch.manual_seed(688)
    # the reference mutates d_args['filts'] in __init__ (model.py:783)
    ref = ref_model.RawNet(
        {**d_args, "filts": [list(f) if isinstance(f, list) else f
                             for f in d_args["filts"]]},
        "cpu",
    ).eval()
    _randomize_bn_stats(ref, seed=3)
    sd = _state_dict_np(ref)

    g = np.random.default_rng(5)
    wave = g.standard_normal((2, d_args["nb_samp"])).astype(np.float32)
    with torch.no_grad():
        t_logits, t_logsm = ref(torch.from_numpy(wave))

    model = RawNet(d_args=d_args)
    variables = port_rawnet(sd)
    j_logits, j_logsm = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(wave), False,
    )
    np.testing.assert_allclose(
        np.asarray(j_logits), t_logits.numpy(), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(j_logsm), t_logsm.numpy(), rtol=2e-3, atol=2e-4
    )


def test_convnet_transplant_flatten_mode():
    """Plain CNN (/root/reference/model.py:54-121, '-m cnn'): four strided
    dilated conv blocks, C-major flatten into fc1."""
    from asvspoof2021_air_tpu.interop import port_convnet
    from asvspoof2021_air_tpu.models.convnet import ConvNet

    F_, T_ = 30, 100
    torch.manual_seed(11)
    probe = torch.zeros(1, 1, F_, T_)
    tmp = ref_model.ConvNet(num_classes=2, num_nodes=8, enc_dim=16)
    with torch.no_grad():
        h = tmp.layer4(tmp.layer3(tmp.layer2(tmp.layer1(probe))))
    _, C, H, W = h.shape
    assert C == 64
    ref = ref_model.ConvNet(num_classes=2, num_nodes=C * H * W,
                            enc_dim=16).eval()
    _randomize_bn_stats(ref, seed=7)
    sd = _state_dict_np(ref)

    g = np.random.default_rng(2)
    x = g.standard_normal((2, 1, F_, T_)).astype(np.float32)
    with torch.no_grad():
        t_emb, t_logits = ref(torch.from_numpy(x))

    model = ConvNet(num_classes=2, num_nodes=C * H * W, enc_dim=16)
    variables = port_convnet(sd, flatten_hw=(H, W))
    feats = jnp.asarray(x[:, 0].transpose(0, 2, 1))  # (B, T, F)
    j_emb, j_logits = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        feats, False,
    )
    np.testing.assert_allclose(np.asarray(j_emb), t_emb.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_convnet_transplant_subband_attention_mode():
    """ConvNet with the frequency-collapsing conv5 + SelfAttention pooling
    head (/root/reference/model.py:83-121, subband_attention=True)."""
    from asvspoof2021_air_tpu.interop import port_convnet
    from asvspoof2021_air_tpu.models.convnet import ConvNet

    F_, T_ = 30, 100
    torch.manual_seed(13)
    probe = torch.zeros(1, 1, F_, T_)
    tmp = ref_model.ConvNet(num_classes=2, num_nodes=8, enc_dim=16)
    with torch.no_grad():
        h = tmp.layer4(tmp.layer3(tmp.layer2(tmp.layer1(probe))))
    H = h.shape[2]
    ref = ref_model.ConvNet(num_classes=2, num_nodes=H, enc_dim=16,
                            subband_attention=True).eval()
    _randomize_bn_stats(ref, seed=9)
    sd = _state_dict_np(ref)

    g = np.random.default_rng(4)
    x = g.standard_normal((2, 1, F_, T_)).astype(np.float32)
    with torch.no_grad():
        t_emb, t_logits = ref(torch.from_numpy(x))

    model = ConvNet(num_classes=2, num_nodes=H, enc_dim=16,
                    subband_attention=True)
    variables = port_convnet(sd, subband_attention=True)
    feats = jnp.asarray(x[:, 0].transpose(0, 2, 1))
    j_emb, j_logits = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        feats, False,
    )
    np.testing.assert_allclose(np.asarray(j_emb), t_emb.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_subband_transplant():
    """Subband LCNN ensemble (/root/reference/model.py:612-639): per-band
    LCNN embeddings transplant band by band. The reference only runs when
    its num_nodes equals the per-band frequency width."""
    from asvspoof2021_air_tpu.interop import port_subband
    from asvspoof2021_air_tpu.models.subband import Subband

    band_f, T_ = 32, 750  # the reference LCNN head hardcodes T=750 (:590)
    n_bands = 4
    F_ = band_f * n_bands
    torch.manual_seed(17)
    ref = ref_model.Subband(num_nodes=band_f, enc_dim=16, num_classes=2,
                            subband_num=n_bands).eval()
    _randomize_bn_stats(ref, seed=11)
    sd = _state_dict_np(ref)

    g = np.random.default_rng(6)
    x = g.standard_normal((2, 1, F_, T_)).astype(np.float32)
    with torch.no_grad():
        t_feats = ref(torch.from_numpy(x))

    model = Subband(num_nodes=F_, enc_dim=16, num_classes=2,
                    subband_num=n_bands)
    variables = port_subband(sd, band_nodes=band_f, feat_len=T_,
                             subband_num=n_bands)
    feats = jnp.asarray(x[:, 0].transpose(0, 2, 1))
    j_feats = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        feats, False,
    )
    assert len(j_feats) == len(t_feats) == n_bands
    for jf, tf in zip(j_feats, t_feats):
        np.testing.assert_allclose(np.asarray(jf), tf.numpy(),
                                   rtol=2e-3, atol=2e-4)
