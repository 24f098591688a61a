"""Jitted train / eval steps.

One fused XLA program per step: (optional) on-device LFCC front-end ->
model forward -> losses -> grads -> dual optimizer updates, semantically
matching the reference hot loop (/root/reference/main_train.py:310-481):

- base CE is always computed (logged), but when an add-loss is configured the
  backbone trains on the add-loss alone (weighted), exactly like the
  reference branches at main_train.py:359-418.
- ADV_AUG mode adds the GRL channel-classifier CE to the backbone loss (from
  epoch 1 on, gated by `adv_gate`) and separately trains the classifier(s) on
  detached embeddings (main_train.py:377-453). The reference re-runs the
  forward for the detached pass; here the same embeddings are reused under
  stop_gradient (equivalent training signal, one forward cheaper).
- the reference's within-batch shuffle (main_train.py:344-345) is a no-op for
  all batch-global math (BN moments, mean losses) and is omitted on device.

Static configuration (model, loss kind, adv mode) is closed over; everything
dynamic is traced. Under a data mesh, batches arrive sharded on the leading
axis and XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from asvspoof2021_air_tpu.losses.basic import (
    binary_cross_entropy_with_logits,
    cross_entropy,
)
from asvspoof2021_air_tpu.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class StepConfig:
    add_loss: Optional[str] = None        # None|isolate|iso_sq|ang_iso|p2sgrad
    base_loss: str = "ce"                 # ce|bce
    weight_loss: float = 1.0
    adv_aug: bool = False
    dual_classifier: bool = False         # codec + device classifiers
    remat_policy: Optional[str] = None    # None|'conv_dot'


def _conv_dot_saveable(prim, *_, **__):
    """jax.checkpoint policy: save matmul/conv outputs, recompute the
    elementwise/BN/softmax chains in the backward.

    Motivation (docs/PERFORMANCE.md train trace): in training mode
    autodiff materializes every elementwise intermediate for the
    backward, bloating the BN/attention stages to ~6.6 ms/step at <7% of
    peak, while full-block remat (round 1) recomputed the compute-bound
    convs and measured 16% SLOWER. This policy recomputes ONLY the cheap
    bandwidth-bound ops; the FLOP-carrying conv/dot results stay saved."""
    return prim.name in ("dot_general", "conv_general_dilated")


def _base_loss_and_score(base_loss, logits, labels):
    if base_loss == "bce":
        loss = binary_cross_entropy_with_logits(logits[:, 0], labels)
        score = logits[:, 0]
    else:
        loss = cross_entropy(logits, labels)
        score = jax.nn.softmax(logits, axis=1)[:, 0]
    return loss, score


def make_train_step(
    model,
    loss_module,
    backbone_tx: optax.GradientTransformation,
    loss_tx: Optional[optax.GradientTransformation],
    config: StepConfig,
    classifier=None,
    classifier_tx: Optional[optax.GradientTransformation] = None,
    classifier2=None,
    frontend: Optional[Callable] = None,
    grad_axis: Optional[str] = None,
) -> Callable:
    """Build the jitted train step.

    batch: dict with either 'feat' (B, T, F) or 'wave' (B, L) + 'length',
    plus 'label' (B,) and optional 'channel' ((B,) or (B, 2)).
    `frontend` (for waveform batches) is any fn(batch_dict, rng) -> (B, T, F)
    features — e.g. train.frontend.OnDeviceFrontend fusing augmentation +
    LFCC + padding policy into the step. Returns (new_state, metrics).

    `grad_axis`: set to a mesh axis name when the step runs INSIDE a
    shard_map with the batch sharded over that axis (the member x data
    2-D ensemble mesh). Gradients and metrics are pmean'd over the axis,
    and the per-sample RNG stream is decorrelated across shards by
    folding in the axis index. For BN-free models the update is exactly
    the full-batch update (equal shard sizes). BatchNorm models use
    LOCAL-shard batch moments in the forward (per-replica BN, the
    standard data-parallel design) with the running statistics pmean'd
    for cross-shard consistency — so the update matches a full-batch
    step up to the BN local-vs-global moment difference (and the pmean
    of per-shard variances omits the between-shard mean variance).
    Under plain GSPMD sharding leave it None — XLA computes global batch
    moments and inserts the all-reduces itself.
    """

    def apply_model(params, batch_stats, x, rngs):
        variables = {"params": params, "batch_stats": batch_stats}
        (feats, logits), mutated = model.apply(
            variables, x, True, rngs=rngs, mutable=["batch_stats"]
        )
        return feats, logits, mutated["batch_stats"]

    if config.remat_policy == "conv_dot":
        apply_model = jax.checkpoint(apply_model, policy=_conv_dot_saveable)
    elif config.remat_policy is not None:
        raise ValueError(config.remat_policy)

    def loss_fn(params, loss_params, state, batch, rngs, adv_gate,
                frontend_params):
        x = batch["feat"] if "feat" in batch else frontend(
            batch, rngs["frontend"], frontend_params
        )
        labels = batch["label"]
        feats, logits, new_bs = apply_model(params, state.batch_stats, x, rngs)
        base, _ = _base_loss_and_score(config.base_loss, logits, labels)

        metrics = {"base_loss": base}
        if config.add_loss is None:
            total = base
        elif config.add_loss in ("isolate", "iso_sq"):
            add = loss_module.apply({"params": loss_params}, feats, labels)
            metrics[config.add_loss] = add
            total = add * config.weight_loss
        elif config.add_loss == "ang_iso":
            add, _scores = loss_module.apply({"params": loss_params}, feats, labels)
            metrics["ang_iso"] = add
            total = add * config.weight_loss
            if config.adv_aug:
                if not config.dual_classifier:
                    clf_out = classifier.apply(
                        {"params": state.clf_params}, feats, False
                    )
                    adv = cross_entropy(clf_out, batch["channel"])
                    acc = jnp.mean(
                        (jnp.argmax(clf_out, 1) == batch["channel"]).astype(jnp.float32)
                    )
                else:
                    c1 = classifier.apply({"params": state.clf_params}, feats, False)
                    c2 = classifier2.apply({"params": state.clf2_params}, feats, False)
                    adv = cross_entropy(c1, batch["channel"][:, 0]) + cross_entropy(
                        c2, batch["channel"][:, 1]
                    )
                    acc = jnp.mean(
                        (jnp.argmax(c1, 1) == batch["channel"][:, 0]).astype(jnp.float32)
                    )
                metrics["adv_loss"] = adv
                metrics["adv_acc"] = acc
                total = total + adv_gate * adv
        elif config.add_loss == "p2sgrad":
            add, _scores = loss_module.apply({"params": loss_params}, feats, labels)
            metrics["p2sgrad"] = add
            total = add
        else:
            raise ValueError(config.add_loss)

        return total, (metrics, new_bs, feats)

    def train_step(state: TrainState, batch: Dict[str, Any], rng,
                   adv_gate=0.0, frontend_params=None):
        # Derive this step's key inside the jit (keyed on the traced step
        # counter): callers pass ONE base key for the whole run. Host-side
        # per-step fold_in is an eager device op costing ~2.5 ms/call on the
        # axon backend, and int(state.step) would force a D2H sync.
        rng = jax.random.fold_in(rng, state.step)
        if grad_axis is not None:
            # distinct per-sample draws on each data shard
            rng = jax.random.fold_in(rng, jax.lax.axis_index(grad_axis))
        rngs = {
            "dropout": rng,
            "noise": jax.random.fold_in(rng, 1),
            "frontend": jax.random.fold_in(rng, 2),
        }

        if loss_module is None:
            grad_fn = jax.value_and_grad(
                lambda p: loss_fn(p, None, state, batch, rngs, adv_gate,
                                  frontend_params),
                has_aux=True,
            )
            (total, (metrics, new_bs, feats)), grads = grad_fn(state.params)
            loss_grads = None
        else:
            grad_fn = jax.value_and_grad(
                lambda p, lp: loss_fn(p, lp, state, batch, rngs, adv_gate,
                                      frontend_params),
                argnums=(0, 1),
                has_aux=True,
            )
            (total, (metrics, new_bs, feats)), (grads, loss_grads) = grad_fn(
                state.params, state.loss_params
            )
        if grad_axis is not None:
            # Under shard_map, gradients w.r.t. the data-axis-replicated
            # params arrive auto-PSUMMED over grad_axis (the replicated->
            # varying transpose rule); divide by the axis size to get the
            # full-batch MEAN gradient. Forward values (loss, metrics, BN
            # moments) are still per-shard: pmean them.
            inv = 1.0 / jax.lax.psum(1.0 + 0.0 * total, grad_axis)
            scale = lambda t: jax.tree.map(lambda g: g * inv, t)
            grads = scale(grads)
            if loss_grads is not None:
                loss_grads = scale(loss_grads)
            new_bs = jax.lax.pmean(new_bs, grad_axis)
            metrics = jax.lax.pmean(metrics, grad_axis)
            total = jax.lax.pmean(total, grad_axis)

        updates, new_opt = backbone_tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_loss_params = state.loss_params
        new_loss_opt = state.loss_opt_state
        if loss_module is not None:
            lupd, new_loss_opt = loss_tx.update(
                loss_grads, state.loss_opt_state, state.loss_params
            )
            new_loss_params = optax.apply_updates(state.loss_params, lupd)

        # Classifier phase: CE on detached embeddings
        # (main_train.py:420-453).
        new_clf_params, new_clf_opt = state.clf_params, state.clf_opt_state
        new_clf2_params, new_clf2_opt = state.clf2_params, state.clf2_opt_state
        if config.adv_aug and classifier is not None:
            detached = jax.lax.stop_gradient(feats)

            if not config.dual_classifier:
                def clf_loss(cp):
                    out = classifier.apply({"params": cp}, detached, False)
                    return cross_entropy(out, batch["channel"]), out

                (closs, cout), cgrads = jax.value_and_grad(clf_loss, has_aux=True)(
                    state.clf_params
                )
                if grad_axis is not None:
                    cgrads = scale(cgrads)  # auto-psummed: normalize
                    closs = jax.lax.pmean(closs, grad_axis)
                cupd, new_clf_opt = classifier_tx.update(
                    cgrads, state.clf_opt_state, state.clf_params
                )
                new_clf_params = optax.apply_updates(state.clf_params, cupd)
                metrics["clf_loss"] = closs
                acc = jnp.mean(
                    (jnp.argmax(cout, 1) == batch["channel"]).astype(jnp.float32)
                )
                metrics["clf_acc"] = (jax.lax.pmean(acc, grad_axis)
                                      if grad_axis is not None else acc)
            else:
                def clf1_loss(cp):
                    out = classifier.apply({"params": cp}, detached, False)
                    return cross_entropy(out, batch["channel"][:, 0]), out

                def clf2_loss(cp):
                    out = classifier2.apply({"params": cp}, detached, False)
                    return cross_entropy(out, batch["channel"][:, 1]), out

                (c1loss, c1out), g1 = jax.value_and_grad(clf1_loss, has_aux=True)(
                    state.clf_params
                )
                (c2loss, _), g2 = jax.value_and_grad(clf2_loss, has_aux=True)(
                    state.clf2_params
                )
                if grad_axis is not None:
                    g1, g2 = scale(g1), scale(g2)  # auto-psummed
                    c1loss, c2loss = jax.lax.pmean((c1loss, c2loss),
                                                   grad_axis)
                u1, new_clf_opt = classifier_tx.update(
                    g1, state.clf_opt_state, state.clf_params
                )
                new_clf_params = optax.apply_updates(state.clf_params, u1)
                u2, new_clf2_opt = classifier_tx.update(
                    g2, state.clf2_opt_state, state.clf2_params
                )
                new_clf2_params = optax.apply_updates(state.clf2_params, u2)
                metrics["clf_loss"] = c1loss + c2loss
                acc = jnp.mean(
                    (jnp.argmax(c1out, 1) == batch["channel"][:, 0]).astype(jnp.float32)
                )
                metrics["clf_acc"] = (jax.lax.pmean(acc, grad_axis)
                                      if grad_axis is not None else acc)

        metrics["total_loss"] = total
        new_state = dataclasses.replace(
            state,
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            loss_params=new_loss_params,
            loss_opt_state=new_loss_opt,
            clf_params=new_clf_params,
            clf_opt_state=new_clf_opt,
            clf2_params=new_clf2_params,
            clf2_opt_state=new_clf2_opt,
        )
        return new_state, metrics

    return train_step


def make_multi_step(train_step: Callable, n_steps: int) -> Callable:
    """Wrap a train step in a lax.scan over ``n_steps`` stacked batches.

    One device dispatch per ``n_steps`` optimizer steps: on the axon backend
    each jitted call costs ~6 ms of non-overlapped dispatch latency on top of
    the device time, so scanning K steps amortizes it to ~6/K ms/step.
    ``batch`` arrays carry a leading (n_steps, ...) axis; returned metrics are
    stacked per inner step. Semantically identical to calling the step K
    times (the per-step PRNG key is derived from state.step inside the step).
    """

    def multi_step(state, batches: Dict[str, Any], rng, adv_gate=0.0,
                   frontend_params=None):
        def body(carry, batch):
            new_state, metrics = train_step(carry, batch, rng, adv_gate,
                                            frontend_params)
            return new_state, metrics

        return jax.lax.scan(body, state, batches, length=n_steps)

    return multi_step


def make_eval_step(
    model,
    loss_module,
    config: StepConfig,
    frontend: Optional[Callable] = None,
) -> Callable:
    """Build the jitted eval step: returns (metrics, scores).

    Scoring rules per add-loss follow the reference validation loop
    (/root/reference/main_train.py:526-577): softmax[:,0] for CE, distance to
    center for isolate, the loss module's score output for ang_iso/p2sgrad.
    """

    def eval_step(state: TrainState, batch: Dict[str, Any],
                  frontend_params=None):
        x = batch["feat"] if "feat" in batch else frontend(
            batch, jax.random.PRNGKey(0), frontend_params
        )
        labels = batch["label"]
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        feats, logits = model.apply(variables, x, False)
        base, score = _base_loss_and_score(config.base_loss, logits, labels)

        metrics = {"base_loss": base}
        if config.add_loss in ("isolate", "iso_sq"):
            add = loss_module.apply({"params": state.loss_params}, feats, labels)
            center = state.loss_params["center"]
            score = jnp.linalg.norm(feats - center, axis=1)
            metrics[config.add_loss] = add
        elif config.add_loss == "ang_iso":
            add, score = loss_module.apply(
                {"params": state.loss_params}, feats, labels
            )
            metrics["ang_iso"] = add
        elif config.add_loss == "p2sgrad":
            add, score = loss_module.apply(
                {"params": state.loss_params}, feats, labels
            )
            metrics["p2sgrad"] = add

        return metrics, score, feats

    return eval_step
