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


def test_resnet18_ocsoftmax_trajectory_and_bn_drift():
    """Second architecture (VERDICT r1 item 4b): ResNet18 + OCSoftmax for
    20 steps from transplanted weights — per-step losses track the torch
    reference AND the BN running statistics drift identically (compared
    via the same port used for the initial transplant)."""
    import model as ref_model

    from asvspoof2021_air_tpu.interop import port_resnet
    from asvspoof2021_air_tpu.models.resnet import ResNet

    B, T, enc = 8, 60, 256
    n_steps = 20
    lr = 5e-4

    torch.manual_seed(11)
    t_model = ref_model.ResNet(3, enc, resnet_type="18", nclasses=2)
    t_loss = ref_loss.AngularIsoLoss(feat_dim=enc, r_real=0.9, r_fake=0.2,
                                     alpha=20.0)
    t_model.train()
    t_opt = torch.optim.Adam(t_model.parameters(), lr=lr, weight_decay=5e-4)
    t_lopt = torch.optim.SGD(t_loss.parameters(), lr=lr)

    sd0 = {k: v.detach().numpy().copy()
           for k, v in t_model.state_dict().items()}
    center0 = t_loss.center.detach().numpy().copy()

    g = np.random.default_rng(2)
    feats = g.standard_normal((n_steps, B, 1, 60, T)).astype(np.float32)
    labels = (np.arange(B) % 2).astype(np.int64)
    feats += 0.5 * labels[None, :, None, None, None]

    t_losses = []
    for s in range(n_steps):
        torch.manual_seed(100 + s)  # pooling adds 1e-5 noise
        emb, _ = t_model(torch.from_numpy(feats[s]))
        loss, _ = t_loss(emb, torch.from_numpy(labels))
        t_opt.zero_grad()
        t_lopt.zero_grad()
        loss.backward()
        t_opt.step()
        t_lopt.step()
        t_losses.append(float(loss.detach()))

    variables = port_resnet(sd0, resnet_type="18")
    model = ResNet(num_nodes=3, enc_dim=enc, resnet_type="18", nclasses=2)
    loss_mod = build_loss("ang_iso", enc_dim=enc, r_real=0.9, r_fake=0.2,
                          alpha=20.0)
    btx = make_backbone_optimizer(lambda _: lr)
    ltx = make_loss_optimizer(lambda _: lr)
    state = create_train_state(
        jax.random.PRNGKey(0), model,
        jnp.asarray(feats[0][:, 0].transpose(0, 2, 1)),
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
    state = state.replace(
        opt_state=btx.init(state.params),
        loss_opt_state=ltx.init(state.loss_params),
    )
    step = jax.jit(make_train_step(model, loss_mod, btx, ltx,
                                   StepConfig(add_loss="ang_iso")))
    j_losses = []
    for s in range(n_steps):
        batch = {
            "feat": jnp.asarray(feats[s][:, 0].transpose(0, 2, 1)),
            "label": jnp.asarray(labels.astype(np.int32)),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(s))
        j_losses.append(float(metrics["ang_iso"]))

    t_losses = np.asarray(t_losses)
    j_losses = np.asarray(j_losses)
    np.testing.assert_allclose(j_losses[:4], t_losses[:4], rtol=5e-3)
    # rtol + small atol: late losses decay to ~0.2, where float drift
    # accumulated over 20 Adam steps inflates the relative error
    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-2, atol=0.03)
    assert t_losses[-1] < t_losses[0]

    # BN running-stat drift: port the FINAL torch state and compare
    sdN = {k: v.detach().numpy().copy()
           for k, v in t_model.state_dict().items()}
    final_ref = port_resnet(sdN, resnet_type="18")["batch_stats"]

    # Per-leaf drift vectors (final - initial) must agree in direction and
    # magnitude. (Element-wise closeness is too strict: the stats track
    # layer input distributions, which inherit the slow param drift of 20
    # Adam steps.)
    drift_seen = 0.0
    for ours, ref, init in zip(jax.tree.leaves(state.batch_stats),
                               jax.tree.leaves(final_ref),
                               jax.tree.leaves(variables["batch_stats"])):
        d_ours = np.asarray(ours, np.float64).ravel() -             np.asarray(init, np.float64).ravel()
        d_ref = np.asarray(ref, np.float64).ravel() -             np.asarray(init, np.float64).ravel()
        n_ours, n_ref = np.linalg.norm(d_ours), np.linalg.norm(d_ref)
        drift_seen = max(drift_seen, n_ref)
        if n_ref < 1e-4:
            continue
        cos = float(np.dot(d_ours, d_ref) / (n_ours * n_ref + 1e-12))
        assert cos > 0.98, f"BN drift direction diverged: cos={cos:.3f}"
        assert 0.8 < n_ours / n_ref < 1.25, (n_ours, n_ref)
    # and the stats actually drifted from the initial transplant
    assert drift_seen > 1e-2


def test_ecapa_adv_aug_trajectory_matches_reference():
    """ADV_AUG two-phase dynamics (VERDICT r1 item 4a,
    /root/reference/main_train.py:377-453): phase 1 trains the backbone +
    OCSoftmax center on ang_iso + the GRL-reversed channel CE (gated off
    for the first 'epoch'); phase 2 trains the classifier on detached
    embeddings with its own Adam. Both classifiers run deterministically
    (torch .eval(): the framework applies the classifier without dropout
    by design)."""
    B, T, C, scale, enc = 8, 50, 64, 4, 256
    n_channels = 7
    n_steps = 20
    gate_from = 4          # reference gates phase-1 adv by epoch>0
    lr, lr_d, lam = 5e-4, 1e-4, 0.05

    import model as ref_model

    from asvspoof2021_air_tpu.interop import port_channel_classifier
    from asvspoof2021_air_tpu.models.classifier import ChannelClassifier
    from asvspoof2021_air_tpu.train.state import make_backbone_optimizer

    torch.manual_seed(21)
    t_model = ref_ecapa.Res2Net2(ref_ecapa.Bottle2neck, C=C,
                                 model_scale=scale, nOut=2, n_mels=60)
    t_loss = ref_loss.AngularIsoLoss(feat_dim=enc, r_real=0.9, r_fake=0.2,
                                     alpha=20.0)
    t_clf = ref_model.ChannelClassifier(enc, n_channels, torch.tensor(lam))
    t_model.train()
    t_clf.eval()  # deterministic classifier (see docstring)
    t_opt = torch.optim.Adam(t_model.parameters(), lr=lr, weight_decay=5e-4)
    t_lopt = torch.optim.SGD(t_loss.parameters(), lr=lr)
    t_copt = torch.optim.Adam(t_clf.parameters(), lr=lr_d,
                              weight_decay=5e-4)
    criterion = torch.nn.CrossEntropyLoss()

    sd0 = {k: v.detach().numpy().copy()
           for k, v in t_model.state_dict().items()}
    clf_sd0 = {k: v.detach().numpy().copy()
               for k, v in t_clf.state_dict().items()}
    center0 = t_loss.center.detach().numpy().copy()

    g = np.random.default_rng(4)
    feats = g.standard_normal((n_steps, B, 60, T)).astype(np.float32)
    labels = (np.arange(B) % 2).astype(np.int64)
    channels = (np.arange(B) % n_channels).astype(np.int64)
    feats += 0.5 * labels[None, :, None, None]
    feats += 0.1 * channels[None, :, None, None]

    t_losses, t_advs, t_closs = [], [], []
    for s in range(n_steps):
        x = torch.from_numpy(feats[s])
        emb, _ = t_model(x)
        angloss, _ = t_loss(emb, torch.from_numpy(labels))
        feat_loss = angloss
        if s >= gate_from:
            adv = criterion(t_clf(emb), torch.from_numpy(channels))
            feat_loss = feat_loss + adv
            t_advs.append(float(adv.detach()))
        t_opt.zero_grad()
        t_lopt.zero_grad()
        t_copt.zero_grad()
        feat_loss.backward()
        t_opt.step()
        t_lopt.step()
        # phase 2: classifier on re-computed, detached embeddings
        emb2, _ = t_model(x)
        closs = criterion(t_clf(emb2.detach()), torch.from_numpy(channels))
        t_copt.zero_grad()
        closs.backward()
        t_copt.step()
        t_losses.append(float(angloss.detach()))
        t_closs.append(float(closs.detach()))

    # ---- this framework from the same weights ----
    variables = port_ecapa(sd0, model_scale=scale)
    model = ECAPA_TDNN(C=C, model_scale=scale, n_out=2, n_feat=60,
                       enc_dim=enc)
    loss_mod = build_loss("ang_iso", enc_dim=enc, r_real=0.9, r_fake=0.2,
                          alpha=20.0)
    clf = ChannelClassifier(enc_dim=enc, nclasses=n_channels, lambda_=lam)
    clf_vars = port_channel_classifier(clf_sd0)
    btx = make_backbone_optimizer(lambda _: lr)
    ltx = make_loss_optimizer(lambda _: lr)
    ctx = make_backbone_optimizer(lambda _: lr_d)
    state = create_train_state(
        jax.random.PRNGKey(0), model,
        jnp.asarray(feats[0].transpose(0, 2, 1)),
        loss_module=loss_mod,
        example_feat=jnp.zeros((B, enc)),
        example_labels=jnp.asarray(labels.astype(np.int32)),
        backbone_tx=btx, loss_tx=ltx,
        classifier=clf, classifier_tx=ctx,
    )
    state = state.replace(
        params=jax.tree.map(jnp.asarray, variables["params"]),
        batch_stats=jax.tree.map(jnp.asarray, variables["batch_stats"]),
        loss_params={"center": jnp.asarray(center0)},
        clf_params=jax.tree.map(jnp.asarray, clf_vars["params"]),
    )
    state = state.replace(
        opt_state=btx.init(state.params),
        loss_opt_state=ltx.init(state.loss_params),
        clf_opt_state=ctx.init(state.clf_params),
    )

    step = jax.jit(make_train_step(
        model, loss_mod, btx, ltx,
        StepConfig(add_loss="ang_iso", adv_aug=True),
        classifier=clf, classifier_tx=ctx,
    ))
    j_losses, j_advs, j_closs = [], [], []
    for s in range(n_steps):
        batch = {
            "feat": jnp.asarray(feats[s].transpose(0, 2, 1)),
            "label": jnp.asarray(labels.astype(np.int32)),
            "channel": jnp.asarray(channels.astype(np.int32)),
        }
        gate = 1.0 if s >= gate_from else 0.0
        state, metrics = step(state, batch, jax.random.PRNGKey(s), gate)
        j_losses.append(float(metrics["ang_iso"]))
        j_closs.append(float(metrics["clf_loss"]))
        if s >= gate_from:
            j_advs.append(float(metrics["adv_loss"]))

    np.testing.assert_allclose(j_losses[:4], t_losses[:4], rtol=5e-3)
    # the gated phase flip at step 4 drives the loss into an oscillating
    # regime where 20-step float drift amplifies: require tight tracking
    # through the flip, loose pointwise agreement after, and a matching
    # overall trajectory shape
    np.testing.assert_allclose(j_losses[:8], t_losses[:8], rtol=5e-2)
    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-1, atol=0.05)
    np.testing.assert_allclose(j_advs, t_advs, rtol=2e-1, atol=0.05)
    np.testing.assert_allclose(j_closs, t_closs, rtol=2e-1, atol=0.05)
    assert np.corrcoef(j_losses, t_losses)[0, 1] > 0.99
    # classifier actually learned (phase 2) and the GRL pushed the
    # backbone the same way (the center tracks)
    assert t_closs[-1] < t_closs[0]
    np.testing.assert_allclose(
        np.asarray(state.loss_params["center"]),
        t_loss.center.detach().numpy(), rtol=5e-2, atol=1e-4,
    )


def test_long_horizon_schedule_and_convergence_parity():
    """Long-horizon training-dynamics parity (round-3 verdict item 5):
    a compressed step-decay schedule (x0.5 every 5 'epochs', the
    reference's lr * 0.5^(epoch//30) law of main_train.py:144-147 with
    the interval compressed) run for 12 epochs x 10 steps from the same
    transplanted init. Asserts (a) per-epoch dev-loss curves track
    through BOTH decay boundaries, (b) the model-selection decision
    (argmin dev loss, main_train.py:692-714) agrees, and (c) the
    converged models score a held-out set to the same EER."""
    from asvspoof2021_air_tpu.metrics.eer import compute_eer
    from asvspoof2021_air_tpu.train.state import step_decay_schedule

    B, T, C, scale, enc = 8, 50, 64, 4, 256
    EPOCHS, SPE, INTERVAL = 12, 10, 5
    lr0 = 5e-4

    torch.manual_seed(3)
    t_model = ref_ecapa.Res2Net2(ref_ecapa.Bottle2neck, C=C,
                                 model_scale=scale, nOut=2, n_mels=60)
    t_loss = ref_loss.AngularIsoLoss(feat_dim=enc, r_real=0.9, r_fake=0.2,
                                     alpha=20.0)
    t_model.train()
    t_opt = torch.optim.Adam(t_model.parameters(), lr=lr0, weight_decay=5e-4)
    t_lopt = torch.optim.SGD(t_loss.parameters(), lr=lr0)
    sd0 = {k: v.detach().numpy().copy()
           for k, v in t_model.state_dict().items()}
    center0 = t_loss.center.detach().numpy().copy()

    g = np.random.default_rng(0)
    labels = (np.arange(B) % 2).astype(np.int64)
    sep = 0.12
    feats = (g.standard_normal((EPOCHS * SPE, B, 60, T))
             + sep * labels[None, :, None, None]).astype(np.float32)
    dev = (g.standard_normal((B, 60, T))
           + sep * labels[:, None, None]).astype(np.float32)
    n_hold = 64
    hold_labels = (np.arange(n_hold) % 2).astype(np.int64)
    hold = (g.standard_normal((n_hold, 60, T))
            + sep * hold_labels[:, None, None]).astype(np.float32)

    # ---- torch: per-epoch lr adjust exactly like the reference ----
    t_dev = []
    for ep in range(EPOCHS):
        lr = lr0 * 0.5 ** (ep // INTERVAL)
        for pg in t_opt.param_groups:
            pg["lr"] = lr
        for pg in t_lopt.param_groups:
            pg["lr"] = lr
        for s in range(SPE):
            x = torch.from_numpy(feats[ep * SPE + s])
            emb, _ = t_model(x)
            loss, _ = t_loss(emb, torch.from_numpy(labels))
            t_opt.zero_grad()
            t_lopt.zero_grad()
            loss.backward()
            t_opt.step()
            t_lopt.step()
        t_model.eval()
        with torch.no_grad():
            emb, _ = t_model(torch.from_numpy(dev))
            dl, _ = t_loss(emb, torch.from_numpy(labels))
        t_model.train()
        t_dev.append(float(dl))
    t_model.eval()
    with torch.no_grad():
        emb, _ = t_model(torch.from_numpy(hold))
        _, t_scores = t_loss(emb, torch.from_numpy(hold_labels))
    t_scores = t_scores.detach().numpy()
    t_eer, _ = compute_eer(t_scores[hold_labels == 0],
                           t_scores[hold_labels == 1])

    # ---- this framework: the step_decay_schedule drives BOTH optimizers
    variables = port_ecapa(sd0, model_scale=scale)
    model = ECAPA_TDNN(C=C, model_scale=scale, n_out=2, n_feat=60,
                       enc_dim=enc)
    loss_mod = build_loss("ang_iso", enc_dim=enc, r_real=0.9, r_fake=0.2,
                          alpha=20.0)
    sched = step_decay_schedule(lr0, 0.5, INTERVAL, SPE)
    # the schedule reproduces the reference's per-epoch lr exactly
    for ep in (0, 4, 5, 9, 10, 11):
        assert sched(ep * SPE) == lr0 * 0.5 ** (ep // INTERVAL)
    btx = make_backbone_optimizer(sched)
    ltx = make_loss_optimizer(sched)
    state = create_train_state(
        jax.random.PRNGKey(0), model,
        jnp.asarray(feats[0].transpose(0, 2, 1)), loss_module=loss_mod,
        example_feat=jnp.zeros((B, enc)),
        example_labels=jnp.asarray(labels.astype(np.int32)),
        backbone_tx=btx, loss_tx=ltx)
    state = state.replace(
        params=jax.tree.map(jnp.asarray, variables["params"]),
        batch_stats=jax.tree.map(jnp.asarray, variables["batch_stats"]),
        loss_params={"center": jnp.asarray(center0)})
    state = state.replace(opt_state=btx.init(state.params),
                          loss_opt_state=ltx.init(state.loss_params))
    step = jax.jit(make_train_step(model, loss_mod, btx, ltx,
                                   StepConfig(add_loss="ang_iso")))
    j_dev = []
    devj = jnp.asarray(dev.transpose(0, 2, 1))
    labj = jnp.asarray(labels.astype(np.int32))
    for ep in range(EPOCHS):
        for s in range(SPE):
            batch = {"feat": jnp.asarray(
                feats[ep * SPE + s].transpose(0, 2, 1)), "label": labj}
            state, _ = step(state, batch, jax.random.PRNGKey(ep * SPE + s))
        emb, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            devj, False)
        dl, _ = loss_mod.apply({"params": state.loss_params}, emb, labj)
        j_dev.append(float(dl))
    emb, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(hold.transpose(0, 2, 1)), False)
    _, j_scores = loss_mod.apply(
        {"params": state.loss_params}, emb,
        jnp.asarray(hold_labels.astype(np.int32)))
    j_scores = np.asarray(j_scores)
    j_eer, _ = compute_eer(j_scores[hold_labels == 0],
                           j_scores[hold_labels == 1])

    t_dev = np.asarray(t_dev)
    j_dev = np.asarray(j_dev)
    # (a) dev-loss curves track across all 12 epochs (measured drift
    # <= 5.6% at epoch 1, <1% converged)
    np.testing.assert_allclose(j_dev, t_dev, rtol=0.10)
    # the decay boundaries actually matter: loss still moving at ep 5
    assert t_dev[1] < t_dev[0] * 0.5
    # (b) model selection agrees
    assert int(t_dev.argmin()) == int(j_dev.argmin())
    # (c) converged EER parity on the held-out set
    assert abs(t_eer - j_eer) <= 2.0 / n_hold + 1e-9, (
        f"EER diverged: torch {t_eer:.4f} vs jax {j_eer:.4f}")
