"""LM training CLI (reference ``neural_sp/bin/lm/train.py:46-394``):
BPTT iteration over the concatenated corpus with state carry."""
from __future__ import annotations

import logging
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..args import parse_cli, save_config
from ...datasets.lm import LMDataset
from ...models.lm.build import build_lm
from ...trainers.optimizer import build_optimizer
from ...trainers.lr_scheduler import EpochController, noam_schedule
from ...trainers.checkpoint import save_checkpoint, load_checkpoint
from ...trainers.reporter import Reporter

logger = logging.getLogger(__name__)

LM_DEFAULTS = dict(
    lm_type="lstm", unit="word", batch_size=32, bptt=64, n_epochs=20,
    optimizer="adam", lr=1e-3, weight_decay=1e-6, clip_grad_norm=5.0,
    lr_decay_type="metric", lr_decay_rate=0.5, lr_decay_start_epoch=5,
    lr_decay_patient_n_epochs=0, early_stop_patient_n_epochs=-1,
    n_keep_best_checkpoints=5, print_step=200, seed=1, resume="",
    warmup_n_steps=0, backward=False, serialize=False, lsm_prob=0.0,
)


def main(argv=None):
    args = parse_cli(argv if argv is not None else sys.argv[1:], LM_DEFAULTS)
    logging.basicConfig(level=logging.INFO)
    save_dir = args.model_save_dir
    os.makedirs(save_dir, exist_ok=True)

    ds_kw = dict(dict_path=args.dict, unit=args.unit,
                 wp_model=getattr(args, "wp_model", None),
                 batch_size=args.batch_size, bptt=args.bptt,
                 backward=bool(args.backward),
                 serialize=bool(args.serialize))
    train_set = LMDataset(args.train_set, **ds_kw)
    dev_set = LMDataset(args.dev_set, **ds_kw)
    args.vocab = train_set.vocab

    lm = build_lm(args)
    xi0, xo0 = next(iter(train_set))
    variables = lm.init(jax.random.PRNGKey(args.seed), jnp.asarray(xi0),
                        jnp.asarray(xo0))
    params = variables["params"]
    logger.info("#params: %.2fM",
                sum(x.size for x in jax.tree.leaves(params)) / 1e6)

    sched = noam_schedule(getattr(args, "transformer_d_model", 512),
                          args.warmup_n_steps) \
        if args.optimizer in ("noam", "noam_adam") else None
    tx = build_optimizer(args.optimizer, lr=args.lr,
                         weight_decay=args.weight_decay,
                         clip_grad_norm=args.clip_grad_norm, schedule=sched)
    opt_state = tx.init(params)
    controller = EpochController(
        base_lr=args.lr, decay_type=args.lr_decay_type,
        decay_rate=args.lr_decay_rate,
        decay_patient_n_epochs=args.lr_decay_patient_n_epochs,
        decay_start_epoch=args.lr_decay_start_epoch,
        early_stop_patient_n_epochs=args.early_stop_patient_n_epochs)

    start_epoch = 1
    if args.resume:
        from ...trainers.checkpoint import restore_like
        ck = load_checkpoint(args.resume)
        params = restore_like(params, ck["params"])
        if "controller" in ck:
            controller.load_state_dict(ck["controller"])
        start_epoch = controller.epoch + 1

    save_config(vars(args), os.path.join(save_dir, "conf.yml"))

    compute_dtype = jnp.bfloat16 \
        if getattr(args, "train_dtype", "float32") in ("bfloat16", "bf16") \
        else None

    # LM data parallelism: ONE jit program over a device mesh, BPTT batch
    # rows sharded over `data`, params replicated (the reference wraps LMs
    # in DDP the same way it does ASR, lm/train.py:167-178)
    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1 and args.batch_size % n_dev == 0:
        from ...parallel.mesh import make_mesh, replicated, batch_sharding
        mesh = make_mesh(n_data=n_dev)
        params = jax.device_put(params, replicated(mesh))
    elif n_dev > 1:
        logger.warning(
            "LM data parallelism DISABLED: batch_size %d is not divisible "
            "by the %d devices — training runs single-device",
            args.batch_size, n_dev)

    def step_fn(params, opt_state, state, xi, xo, key, lr_scale):
        def loss_fn(p):
            if compute_dtype is not None:
                from ...parallel.mesh import cast_floating
                p = cast_floating(p, compute_dtype)
            loss, new_state, obs = lm.apply(
                {"params": p}, xi, xo, state, False,
                rngs={"dropout": key})
            return loss.astype(jnp.float32), (new_state, obs)
        (loss, (new_state, obs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        # epoch-level lr decay applied as a runtime multiplier (the
        # controller can't rebuild the jitted optimizer mid-run)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_state, obs

    if mesh is None:
        step = jax.jit(step_fn)
        eval_step = jax.jit(lambda p, xi, xo, st: lm.apply(
            {"params": p}, xi, xo, st))
    else:
        repl, data = replicated(mesh), batch_sharding(mesh)
        step = jax.jit(step_fn,
                       in_shardings=(repl, repl, data, data, data, repl,
                                     repl),
                       out_shardings=(repl, repl, data, repl))
        eval_step = jax.jit(
            lambda p, xi, xo, st: lm.apply({"params": p}, xi, xo, st),
            in_shardings=(repl, data, data, data),
            out_shardings=(repl, data, repl))

    reporter = Reporter(save_dir)
    rng = jax.random.PRNGKey(args.seed)
    for epoch in range(start_epoch, args.n_epochs + 1):
        state = None
        t0 = time.time()
        lr_scale = jnp.float32(controller.lr / args.lr if args.lr else 1.0)
        for xi, xo in train_set:
            rng, key = jax.random.split(rng)
            params, opt_state, state, obs = step(
                params, opt_state, state, jnp.asarray(xi), jnp.asarray(xo),
                key, lr_scale)
            reporter.add_observation(obs)
            reporter.step_forward()
            if reporter.step % args.print_step == 0:
                logger.info("step %d: loss %.3f ppl %.1f", reporter.step,
                            float(obs["loss"]), float(obs["ppl"]))
        # dev ppl (skipped -> inf before eval_start_epoch, reference
        # lm/train.py:204)
        state = None
        tot_nll, tot_windows = 0.0, 0
        dev_iter = dev_set \
            if epoch >= getattr(args, "eval_start_epoch", 1) else []
        if not dev_iter:
            tot_nll = float("inf")
        for xi, xo in dev_iter:
            loss, state, obs = eval_step(params, jnp.asarray(xi),
                                         jnp.asarray(xo), state)
            tot_nll += float(jnp.log(obs["ppl"]))
            tot_windows += 1
        dev_ppl = float(np.exp(tot_nll / max(tot_windows, 1)))
        actions = controller.step_epoch(dev_ppl)
        reporter.epoch_summary(epoch, {"dev_ppl": dev_ppl,
                                       "lr": actions["lr"]})
        logger.info("epoch %d: dev ppl %.2f (%.1fs)%s", epoch, dev_ppl,
                    time.time() - t0, " *best*" if actions["is_best"] else "")
        keep = controller.topk_epochs(args.n_keep_best_checkpoints)
        save_checkpoint(save_dir, epoch, params, None,
                        controller.state_dict(), keep_epochs=keep)
        if actions["early_stop"]:
            break
    return save_dir


if __name__ == "__main__":
    main()
