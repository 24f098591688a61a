"""Training-DYNAMICS parity against the torch reference.

The strongest data-free evidence beyond forward transplants: start both
frameworks from the SAME weights (transplanted torch init), feed the SAME
batches through the reference's exact optimizer topology (torch Adam with
L2-coupled weight decay on the backbone + plain SGD on the OCSoftmax
center, both stepped per iteration — /root/reference/main_train.py:175-176,
272, 404-409), and require the per-step loss trajectories to track. SURVEY
§7 lists "one-class loss dynamics" as a hard part: this pins it.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.modules.setdefault(
    "pytorch_model_summary", types.SimpleNamespace(summary=lambda *a, **k: "")
)
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

ref_ecapa = pytest.importorskip("ecapa_tdnn")
ref_loss = pytest.importorskip("loss")

from asvspoof2021_air_tpu.interop import port_ecapa  # noqa: E402
from asvspoof2021_air_tpu.losses import build_loss  # noqa: E402
from asvspoof2021_air_tpu.models.ecapa import ECAPA_TDNN  # noqa: E402
from asvspoof2021_air_tpu.train.state import (  # noqa: E402
    create_train_state,
    make_backbone_optimizer,
    make_loss_optimizer,
)
from asvspoof2021_air_tpu.train.steps import (  # noqa: E402
    StepConfig,
    make_train_step,
)


def test_ocsoftmax_training_trajectory_matches_reference():
    B, T, C, scale, enc = 8, 50, 64, 4, 256
    n_steps = 12
    lr = 5e-4

    torch.manual_seed(3)
    t_model = ref_ecapa.Res2Net2(ref_ecapa.Bottle2neck, C=C, model_scale=scale,
                                 nOut=2, n_mels=60)
    t_loss = ref_loss.AngularIsoLoss(feat_dim=enc, r_real=0.9, r_fake=0.2,
                                     alpha=20.0)
    t_model.train()
    t_opt = torch.optim.Adam(t_model.parameters(), lr=lr, weight_decay=5e-4)
    t_lopt = torch.optim.SGD(t_loss.parameters(), lr=lr)

    # snapshot the shared starting point BEFORE training
    sd0 = {k: v.detach().numpy().copy() for k, v in t_model.state_dict().items()}
    center0 = t_loss.center.detach().numpy().copy()

    g = np.random.default_rng(0)
    feats = g.standard_normal((n_steps, B, 60, T)).astype(np.float32)
    labels = (np.arange(B) % 2).astype(np.int64)
    # separable-ish features so the loss actually moves
    feats += 0.5 * labels[None, :, None, None]

    # ---- torch trajectory (main_train.py:350-409, ang_iso branch) ----
    t_losses = []
    for s in range(n_steps):
        x = torch.from_numpy(feats[s])
        emb, _logits = t_model(x)
        loss, _scores = t_loss(emb, torch.from_numpy(labels))
        t_opt.zero_grad()
        t_lopt.zero_grad()
        loss.backward()
        t_opt.step()
        t_lopt.step()
        t_losses.append(float(loss.detach()))

    # ---- this framework, from the SAME initial weights ----
    variables = port_ecapa(sd0, model_scale=scale)
    model = ECAPA_TDNN(C=C, model_scale=scale, n_out=2, n_feat=60, enc_dim=enc)
    loss_mod = build_loss("ang_iso", enc_dim=enc, r_real=0.9, r_fake=0.2,
                          alpha=20.0)
    btx = make_backbone_optimizer(lambda _: lr)
    ltx = make_loss_optimizer(lambda _: lr)
    state = create_train_state(
        jax.random.PRNGKey(0), model,
        jnp.asarray(feats[0].transpose(0, 2, 1)),
        loss_module=loss_mod,
        example_feat=jnp.zeros((B, enc)),
        example_labels=jnp.asarray(labels.astype(np.int32)),
        backbone_tx=btx, loss_tx=ltx,
    )
    state = state.replace(
        params=jax.tree.map(jnp.asarray, variables["params"]),
        batch_stats=jax.tree.map(jnp.asarray, variables["batch_stats"]),
        loss_params={"center": jnp.asarray(center0)},
    )
    # re-init optimizer states for the transplanted params
    state = state.replace(
        opt_state=btx.init(state.params),
        loss_opt_state=ltx.init(state.loss_params),
    )

    step = jax.jit(make_train_step(model, loss_mod, btx, ltx,
                                   StepConfig(add_loss="ang_iso")))
    j_losses = []
    for s in range(n_steps):
        batch = {
            "feat": jnp.asarray(feats[s].transpose(0, 2, 1)),
            "label": jnp.asarray(labels.astype(np.int32)),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(s))
        j_losses.append(float(metrics["ang_iso"]))

    t_losses = np.asarray(t_losses)
    j_losses = np.asarray(j_losses)
    # trajectories track step for step (f32 + Adam noise accumulates slowly)
    np.testing.assert_allclose(j_losses[:4], t_losses[:4], rtol=2e-3)
    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-2)
    # and training actually progressed
    assert t_losses[-1] < t_losses[0]
    # the learned OCSoftmax center moved the same way
    np.testing.assert_allclose(
        np.asarray(state.loss_params["center"]),
        t_loss.center.detach().numpy(),
        atol=5e-3,
    )
