"""Optimizer factory (reference ``neural_sp/trainers/optimizer.py:12-82``)
built on optax. 'noam' is adam + the Noam schedule (see lr_scheduler)."""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class EfficientMultiStepsState(NamedTuple):
    mini_step: Any        # 0..k-1 position within the accumulation cycle
    gradient_step: Any    # number of emitted (real) optimizer steps
    inner_opt_state: Any
    acc_grads: Any        # running MEAN of this cycle's grads


def efficient_multi_steps(opt: optax.GradientTransformation,
                          k: int) -> optax.GradientTransformation:
    """Gradient accumulation without the optax.MultiSteps waste.

    optax.MultiSteps runs the FULL inner update (clip-by-global-norm +
    adam moment reads/writes) on EVERY microstep and merges the result
    with ``jnp.where(emit, ...)`` — at k=4 that is 3 wasted adam passes
    (~5 HBM sweeps over every parameter each) per cycle. Here the inner
    update sits inside a ``lax.cond`` so non-emit microsteps only fold
    the new grads into the running mean (one fused elementwise pass).
    Mean-accumulation semantics are identical to optax.MultiSteps
    (asserted by tests/test_grad_accum.py); the emit-step zeroing pass is
    folded into the next cycle's first accumulate (``where(n == 0, ...)``).
    """

    def init_fn(params):
        return EfficientMultiStepsState(
            mini_step=jnp.zeros([], jnp.int32),
            gradient_step=jnp.zeros([], jnp.int32),
            inner_opt_state=opt.init(params),
            acc_grads=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None, **extra_args):
        n = state.mini_step
        inv = 1.0 / (n + 1).astype(jnp.float32)
        acc = jax.tree.map(
            lambda u, a: jnp.where(
                n == 0, u.astype(a.dtype),
                a + (u.astype(a.dtype) - a) * inv.astype(a.dtype)),
            updates, state.acc_grads)
        emit = n == k - 1

        def _do(operand):
            acc_, inner_ = operand
            return opt.update(acc_, inner_, params=params, **extra_args)

        def _skip(operand):
            acc_, inner_ = operand
            return jax.tree.map(jnp.zeros_like, acc_), inner_

        final_updates, inner = jax.lax.cond(
            emit, _do, _skip, (acc, state.inner_opt_state))
        new_state = EfficientMultiStepsState(
            mini_step=(n + 1) % k,
            gradient_step=state.gradient_step + emit.astype(jnp.int32),
            inner_opt_state=inner,
            acc_grads=acc,
        )
        return final_updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


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
        out = efficient_multi_steps(out, accum_grad_n_steps)
    return out
