"""Train state: backbone + loss-module parameters with split optimizers.

Mirrors the reference's optimizer topology
(/root/reference/main_train.py:175-176, 260-277): Adam (weight_decay 5e-4,
L2-coupled like torch Adam) on the backbone, plain SGD on the loss module's
parameters, both stepped each iteration and sharing the step-decay schedule
lr * 0.5^(epoch // 30) (main_train.py:144-147).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    step: int
    params: Any
    batch_stats: Any
    opt_state: Any
    loss_params: Any          # None when training with base loss only
    loss_opt_state: Any
    clf_params: Any = None    # adversarial channel classifier (ADV_AUG)
    clf_opt_state: Any = None
    clf2_params: Any = None   # second classifier (device IDs, LAPA/DFPA)
    clf2_opt_state: Any = None


def step_decay_schedule(
    base_lr: float, decay: float, interval_epochs: int, steps_per_epoch: int
) -> Callable[[int], float]:
    """lr * decay^(epoch // interval) as a function of the global step
    (/root/reference/main_train.py:144-147)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * (decay ** (epoch // interval_epochs))

    return schedule


def make_backbone_optimizer(
    lr_schedule: Callable[[int], float],
    beta_1: float = 0.9,
    beta_2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 5e-4,
) -> optax.GradientTransformation:
    """torch-Adam-style optimizer: L2 weight decay folded into the gradient
    before the moment updates (torch.optim.Adam(weight_decay=...) semantics,
    unlike decoupled AdamW)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=beta_1, b2=beta_2, eps=eps),
        optax.scale_by_learning_rate(lr_schedule),
    )


def make_loss_optimizer(lr_schedule: Callable[[int], float]) -> optax.GradientTransformation:
    """Plain SGD for loss-module parameters
    (/root/reference/main_train.py:260,272,277)."""
    return optax.sgd(lr_schedule)


def create_train_state(
    rng: jax.Array,
    model,
    example_input,
    loss_module=None,
    example_feat=None,
    example_labels=None,
    backbone_tx: Optional[optax.GradientTransformation] = None,
    loss_tx: Optional[optax.GradientTransformation] = None,
    classifier=None,
    classifier_tx: Optional[optax.GradientTransformation] = None,
    classifier2=None,
) -> TrainState:
    """Initialize parameters, batch stats, and optimizer states."""
    k_model, k_loss, k_clf, k_clf2 = jax.random.split(rng, 4)
    variables = model.init({"params": k_model}, example_input, True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())

    if backbone_tx is None:
        backbone_tx = make_backbone_optimizer(lambda _: 5e-4)
    opt_state = backbone_tx.init(params)

    loss_params = None
    loss_opt_state = None
    if loss_module is not None:
        lv = loss_module.init(k_loss, example_feat, example_labels)
        loss_params = lv["params"]
        if loss_tx is None:
            loss_tx = make_loss_optimizer(lambda _: 5e-4)
        loss_opt_state = loss_tx.init(loss_params)

    clf_params = clf_opt_state = clf2_params = clf2_opt_state = None
    if classifier is not None:
        cv = classifier.init({"params": k_clf}, example_feat, False)
        clf_params = cv["params"]
        clf_opt_state = classifier_tx.init(clf_params)
    if classifier2 is not None:
        cv2 = classifier2.init({"params": k_clf2}, example_feat, False)
        clf2_params = cv2["params"]
        clf2_opt_state = classifier_tx.init(clf2_params)

    return TrainState(
        step=0,
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        loss_params=loss_params,
        loss_opt_state=loss_opt_state,
        clf_params=clf_params,
        clf_opt_state=clf_opt_state,
        clf2_params=clf2_params,
        clf2_opt_state=clf2_opt_state,
    )
