"""Optimizer factory (reference ``neural_sp/trainers/optimizer.py:12-82``)
built on optax. 'noam' is adam + the Noam schedule (see lr_scheduler)."""
from __future__ import annotations

import optax


def build_optimizer(
    optimizer: str = "adam",
    lr: float = 1e-3,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    clip_grad_norm: float = 5.0,
    schedule=None,
    accum_grad_n_steps: int = 1,
) -> optax.GradientTransformation:
    lr_or_sched = schedule if schedule is not None else lr
    name = optimizer
    if name in ("noam", "noam_adam"):
        name = "adam"
    if name == "sgd":
        tx = optax.sgd(lr_or_sched)
    elif name == "momentum":
        tx = optax.sgd(lr_or_sched, momentum=momentum)
    elif name == "nesterov":
        tx = optax.sgd(lr_or_sched, momentum=momentum, nesterov=True)
    elif name == "adadelta":
        # reference quirk: eps is set from lr for adadelta (optimizer.py:44)
        tx = optax.adadelta(learning_rate=1.0, eps=lr)
    elif name == "adam":
        tx = optax.adam(lr_or_sched)
    elif name == "adamw":
        tx = optax.adamw(lr_or_sched, weight_decay=weight_decay)
    elif name == "adagrad":
        tx = optax.adagrad(lr_or_sched)
    elif name == "rmsprop":
        tx = optax.rmsprop(lr_or_sched)
    else:
        raise ValueError(f"unknown optimizer: {optimizer}")
    chain = []
    if clip_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(clip_grad_norm))
    chain.append(tx)
    if weight_decay > 0 and name != "adamw":
        chain.append(optax.add_decayed_weights(-weight_decay))
    out = optax.chain(*chain)
    if accum_grad_n_steps > 1:
        out = optax.MultiSteps(out, every_k_schedule=accum_grad_n_steps)
    return out
