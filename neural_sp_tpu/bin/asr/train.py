"""ASR training CLI (reference ``neural_sp/bin/asr/train.py:55-586``).

Usage:
  python -m neural_sp_tpu.bin.asr.train --config conf.yml \
      --train_set train.tsv --dev_set dev.tsv --dict dict.txt \
      --model_save_dir exp/

One jit'd train step serves the whole run (shapes bucketed by the loader);
multi-device data parallelism is a mesh + sharded batches, not process
groups (SURVEY.md §2.10).
"""
from __future__ import annotations

import logging
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ...bin.args import parse_args_train, save_config
from ...datasets.asr.build import build_dataloader
from ...models.speech2text import build_speech2text
from ...parallel.mesh import make_mesh, make_train_step, replicated
from ...trainers.optimizer import build_optimizer
from ...trainers.lr_scheduler import (
    noam_schedule, warmup_schedule, EpochController)
from ...trainers.checkpoint import (
    save_checkpoint, load_checkpoint, latest_epoch)
from ...trainers.reporter import Reporter

logger = logging.getLogger(__name__)


def compute_subsampling_factor(args) -> int:
    """Total encoder time-subsampling from the config (reference
    bin/train_utils.py:17): conv pooling strides x interlayer subsamples.
    Drives the CTC length filter and word-alignment trigger scaling."""
    import re
    f = 1
    enc = str(getattr(args, "enc_type", ""))
    if enc.startswith("conv") and getattr(args, "conv_poolings", ""):
        for m in re.findall(r"\((\d+)\s*,\s*\d+\)",
                            str(args.conv_poolings)):
            f *= max(int(m), 1)
    sub = getattr(args, "subsample", "")
    if sub:
        for tok in str(sub).split("_"):
            if tok.isdigit():
                f *= max(int(tok), 1)
    return f


def make_schedule(args):
    if args.optimizer in ("noam", "noam_adam") or \
            getattr(args, "warmup_n_steps", 0) > 0 and \
            args.optimizer == "noam":
        return noam_schedule(args.transformer_d_model,
                             max(args.warmup_n_steps, 1),
                             factor=getattr(args, "lr_factor", 1.0))
    if getattr(args, "warmup_n_steps", 0) > 0:
        return warmup_schedule(args.lr,
                               getattr(args, "warmup_start_lr", args.lr / 100),
                               args.warmup_n_steps)
    return None


def main(argv=None):
    args = parse_args_train(argv if argv is not None else sys.argv[1:])
    logging.basicConfig(level=logging.INFO)
    np.random.seed(args.seed)

    save_dir = args.model_save_dir
    os.makedirs(save_dir, exist_ok=True)

    loader_kw = dict(
        dict_path=args.dict, unit=args.unit,
        wp_model=getattr(args, "wp_model", None),
        batch_size=args.batch_size, batch_size_type=args.batch_size_type,
        dynamic_batching=args.dynamic_batching,
        min_n_frames=args.min_n_frames, max_n_frames=args.max_n_frames,
        subsample_factor=compute_subsampling_factor(args), seed=args.seed,
        # per-utterance frame stacking / splicing (reference
        # speech2text.py:371-377; host-side here)
        n_stacks=getattr(args, "n_stacks", 1),
        n_skips=getattr(args, "n_skips", 1),
        n_splices=getattr(args, "n_splices", 1),
        # hierarchical MTL sub-task label streams (reference build.py:94-103)
        dict_path_sub1=getattr(args, "dict_sub1", None) or None,
        unit_sub1=getattr(args, "unit_sub1", "char"),
        wp_model_sub1=getattr(args, "wp_model_sub1", None),
        dict_path_sub2=getattr(args, "dict_sub2", None) or None,
        unit_sub2=getattr(args, "unit_sub2", "char"),
        wp_model_sub2=getattr(args, "wp_model_sub2", None),
        # MinLT word alignments / CTC forced-alignment triggers (reference
        # --train_word_alignment / --train_ctc_alignment)
        word_alignment_dir=getattr(args, "train_word_alignment", None)
        or None,
        ctc_alignment_dir=getattr(args, "train_ctc_alignment", None) or None,
        # coarse padding grid: few distinct compiled shapes (TPU-first)
        pad_xlen_multiple=getattr(args, "pad_xlen_multiple", 128),
        pad_ylen_multiple=getattr(args, "pad_ylen_multiple", 32),
        pad_batch_multiple=max(len(jax.devices()), 1))
    # the reference also accepts shuffle_bucket: true (args_asr.py:227)
    bucketing = "shuffle" if getattr(args, "shuffle_bucket", False) \
        else args.bucketing
    train_set = build_dataloader(args.train_set, bucketing=bucketing,
                                 sort_stop_epoch=args.sort_stop_epoch,
                                 **loader_kw)
    dev_set = build_dataloader(args.dev_set, bucketing="sort", is_test=True,
                               **loader_kw)
    args.vocab = train_set.vocab
    if train_set.vocab_sub1:
        args.vocab_sub1 = train_set.vocab_sub1
    if train_set.vocab_sub2:
        args.vocab_sub2 = train_set.vocab_sub2
    args.input_dim = int(train_set.dataset.df["xdim"].iloc[0]) \
        if "xdim" in train_set.dataset.df else args.input_dim
    # frame stacking/splicing widen the feature dim seen by the model:
    # stacking x n_stacks; splice(n) concatenates +-n context frames
    # -> x (2n+1) (frontends/splicing.py)
    args.input_dim *= getattr(args, "n_stacks", 1)
    if getattr(args, "n_splices", 1) > 1:
        args.input_dim *= 2 * args.n_splices + 1

    model = build_speech2text(args)
    batch0 = next(iter(train_set))
    variables = model.init(jax.random.PRNGKey(args.seed),
                           jnp.asarray(batch0["xs"]),
                           jnp.asarray(batch0["xlens"]),
                           jnp.asarray(batch0["ys"]),
                           jnp.asarray(batch0["ylens"]))
    params = variables["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    logger.info("#params: %.2fM", n_params / 1e6)

    controller = EpochController(
        base_lr=args.lr, decay_type=args.lr_decay_type,
        decay_rate=args.lr_decay_rate,
        decay_patient_n_epochs=args.lr_decay_patient_n_epochs,
        decay_start_epoch=args.lr_decay_start_epoch,
        early_stop_patient_n_epochs=args.early_stop_patient_n_epochs)
    tx = build_optimizer(args.optimizer, lr=args.lr,
                         weight_decay=args.weight_decay,
                         clip_grad_norm=args.clip_grad_norm,
                         schedule=make_schedule(args),
                         accum_grad_n_steps=args.accum_grad_n_steps)
    opt_state = tx.init(params)

    start_epoch = 1
    if args.resume:
        from ...trainers.checkpoint import restore_like
        ck = load_checkpoint(args.resume)
        params = restore_like(params, ck["params"])
        if "opt_state" in ck:
            opt_state = restore_like(opt_state, ck["opt_state"])
        if "controller" in ck:
            controller.load_state_dict(ck["controller"])
        start_epoch = controller.epoch + 1
        logger.info("resumed from %s (epoch %d)", args.resume, start_epoch)

    n_dev = len(jax.devices())
    # optional tensor parallelism: --n_model K shards large kernels over a
    # `model` mesh axis (param_shardings); default pure DP
    n_model = max(int(getattr(args, "n_model", 1)), 1)
    if n_model > 1:
        assert n_dev % n_model == 0 and n_dev >= n_model, (
            f"--n_model {n_model} must divide the device count {n_dev}")
    mesh = make_mesh(n_data=n_dev // n_model, n_model=n_model) \
        if n_dev > 1 else None
    tp_shardings = None
    if mesh is not None:
        if n_model > 1:
            from ...parallel.mesh import param_shardings
            tp_shardings = param_shardings(params, mesh)
            params = jax.device_put(params, tp_shardings)
            # re-layout (NOT re-init) the optimizer state onto the moment
            # shardings propagation would pick — a resumed opt_state keeps
            # its restored values
            template = tx.init(params)
            opt_state = jax.tree.map(
                lambda v, t: jax.device_put(jnp.asarray(v), t.sharding),
                opt_state, template)
        else:
            params = jax.device_put(params, replicated(mesh))
            opt_state = jax.device_put(opt_state, replicated(mesh))
    rsp_prob = getattr(args, "rsp_prob", 0.0)
    assert not (rsp_prob > 0 and tp_shardings is not None), (
        "rsp_prob training does not support --n_model tensor parallelism "
        "yet (the RSP step is built with replicated params)")
    rsp_carry = None
    compute_dtype = jnp.bfloat16 \
        if getattr(args, "train_dtype", "float32") in ("bfloat16", "bf16") \
        else None
    if rsp_prob > 0:
        # Random State Passing (reference rnn.py:323-327): thread the RNN
        # encoder carry across batches w.p. rsp_prob
        from ...parallel.mesh import make_rsp_train_step
        step_fn = make_rsp_train_step(model, tx, rsp_prob, mesh,
                                      compute_dtype=compute_dtype)
        _, carry0 = model.apply(
            {"params": params}, jnp.asarray(batch0["xs"]),
            jnp.asarray(batch0["xlens"]), method=model.encode)
        assert carry0 is not None, "rsp_prob requires an RNN encoder"
        rsp_carry = jax.tree.map(jnp.zeros_like, carry0)
    else:
        step_fn = make_train_step(model, tx, mesh,
                                  compute_dtype=compute_dtype,
                                  tp_params=tp_shardings)

    # knowledge-distillation teacher (reference speech2text.py:347-367 +
    # train.py teacher args): teacher-forced soft targets per batch
    teacher_fn = None
    teacher_dir = getattr(args, "teacher", "")
    if teacher_dir:
        from types import SimpleNamespace
        from ...bin.args import load_config
        tconf = SimpleNamespace(**load_config(
            os.path.join(teacher_dir, "conf.yml")))
        tmodel = build_speech2text(tconf)
        from ...trainers.checkpoint import latest_epoch as _latest
        tp = load_checkpoint(os.path.join(
            teacher_dir, f"ckpt.epoch-{_latest(teacher_dir)}"))["params"]
        t_temp = getattr(args, "distillation_temperature", 1.0)
        teacher_fn = jax.jit(lambda xs, xlens, ys, ylens: tmodel.apply(
            {"params": tp}, xs, xlens, ys, ylens, t_temp,
            method=tmodel.teacher_probs))
        logger.info("distillation teacher loaded from %s", teacher_dir)

    # MBR fine-tuning (reference train.py:489-504 + las.py:507-616):
    # per-batch n-best generation + WER risks + expected-risk gradient
    mbr_enabled = bool(getattr(args, "mbr_training", False))
    mbr_start = getattr(args, "mbr_start_epoch", 1)
    if mbr_enabled:
        from ...models.decoders.decoding import (
            Speech2TextSession, DecodeConfig)
        from ...evaluators.edit_distance import compute_wer
        mbr_nbest = getattr(args, "mbr_nbest", 4)
        mbr_ce_weight = getattr(args, "mbr_ce_weight", 0.01)

        def _mbr_loss(p, xs, xlens, nbest_ys, nbest_ylens, risks,
                      ys, ylens):
            eouts, _ = model.apply({"params": p}, xs, xlens, "ys",
                                   method=model.encode)
            ex, el = eouts["ys"]["xs"], eouts["ys"]["xlens"]
            loss_mbr = model.apply(
                {"params": p}, ex, el, nbest_ys, nbest_ylens, risks,
                method=lambda m, *a: m.dec_fwd.forward_mbr(*a))
            loss_ce, _ = model.apply({"params": p}, xs, xlens, ys, ylens)
            return loss_mbr + mbr_ce_weight * loss_ce

        @jax.jit
        def mbr_step(p, o, xs, xlens, nbest_ys, nbest_ylens, risks,
                     ys, ylens):
            loss, g = jax.value_and_grad(_mbr_loss)(
                p, xs, xlens, nbest_ys, nbest_ylens, risks, ys, ylens)
            import optax as _optax
            up, o = tx.update(g, o, p)
            return _optax.apply_updates(p, up), o, loss

    save_config(vars(args), os.path.join(save_dir, "conf.yml"))
    for aux in ("dict", "wp_model"):
        p = getattr(args, aux, None)
        if p and os.path.exists(p):
            import shutil
            shutil.copy(p, save_dir)

    reporter = Reporter(save_dir)
    rng = jax.random.PRNGKey(args.seed)

    # Epoch-gated curriculum (reference decoder_base.py:19-155): losses and
    # scheduled sampling activate at their start epochs. Module fields are
    # param-shape-independent, so each phase is just a different jitted step
    # over the same params; phases are cached to avoid recompiles.
    _phase_steps = {}

    def phase_overrides(epoch) -> tuple:
        over = []
        for flag, field in (("ss_start_epoch", "ss_prob"),
                            ("mocha_quantity_loss_start_epoch",
                             "mocha_quantity_loss_weight"),
                            ("mocha_latency_loss_start_epoch",
                             "mocha_latency_loss_weight"),
                            # StableEmit curriculum (reference
                            # train.py:375-376 trigger_stableemit)
                            ("mocha_stableemit_start_epoch",
                             "mocha_stableemit_weight")):
            start = getattr(args, flag, 0)
            if start and epoch < start and getattr(args, field, 0):
                over.append((field, 0.0))
        return tuple(over)

    def step_for_epoch(epoch, extra_over: tuple = ()):
        over = phase_overrides(epoch) + extra_over
        if over not in _phase_steps:
            if over:
                from types import SimpleNamespace
                sub = SimpleNamespace(**{**vars(args), **dict(over)})
                phase_model = build_speech2text(sub)
                if rsp_prob > 0:
                    from ...parallel.mesh import make_rsp_train_step
                    _phase_steps[over] = make_rsp_train_step(
                        phase_model, tx, rsp_prob, mesh,
                        compute_dtype=compute_dtype)
                else:
                    _phase_steps[over] = make_train_step(
                        phase_model, tx, mesh, compute_dtype=compute_dtype,
                        tp_params=tp_shardings)
            else:
                _phase_steps[over] = step_fn
        return _phase_steps[over]

    # mtl_per_batch (reference train.py MTL scheduling): each batch trains
    # ONE task, rotating round-robin — main (att+ctc), then each sub head.
    # Every task is a cached jitted step over the same params with the
    # other tasks' loss weights zeroed.
    mtl_tasks: list[tuple] = []
    if getattr(args, "mtl_per_batch", False):
        sub1_w = getattr(args, "sub1_weight", 0.0)
        sub2_w = getattr(args, "sub2_weight", 0.0)
        for i_sub, w_sub in (("1", sub1_w), ("2", sub2_w)):
            # a sub head without an encoder tap trains on NOTHING — the
            # phase model's eouts lack ys_subN and the loss is 0
            assert w_sub <= 0 or getattr(
                args, f"enc_n_layers_sub{i_sub}", 0) > 0, (
                f"sub{i_sub}_weight > 0 needs --enc_n_layers_sub{i_sub} "
                "(the encoder tap feeding that head)")
        main_over = (("sub1_weight", 0.0), ("sub2_weight", 0.0),
                     ("ctc_weight_sub1", 0.0), ("ctc_weight_sub2", 0.0))
        mtl_tasks.append(main_over)
        # sub tasks scale the head's weight to 1.0 while PRESERVING the
        # att/ctc ratio, so the phase model builds exactly the same
        # modules as the main model (a changed ratio sign would create or
        # drop heads whose params don't exist in the shared tree)
        if sub1_w > 0:
            wc1 = getattr(args, "ctc_weight_sub1", 0.0)
            mtl_tasks.append((("ctc_weight", 0.0), ("bwd_weight", 0.0),
                              ("sub1_weight", 1.0),
                              ("ctc_weight_sub1", wc1 / sub1_w),
                              ("sub2_weight", 0.0),
                              ("ctc_weight_sub2", 0.0)))
        if sub2_w > 0:
            wc2 = getattr(args, "ctc_weight_sub2", 0.0)
            mtl_tasks.append((("ctc_weight", 0.0), ("bwd_weight", 0.0),
                              ("sub1_weight", 0.0),
                              ("ctc_weight_sub1", 0.0),
                              ("sub2_weight", 1.0),
                              ("ctc_weight_sub2", wc2 / sub2_w)))

    # Epoch-level lr decay reaches the jitted step as a runtime multiplier
    # relative to the lr baked into the optimizer at build time (reference
    # mutates optimizer.param_groups lr in-place, lr_scheduler.py:131-225).
    lr_ref = args.lr

    @jax.jit
    def eval_step(p, xs, xlens, ys, ylens):
        return model.apply({"params": p}, xs, xlens, ys, ylens)

    for epoch in range(start_epoch, args.n_epochs + 1):
        epoch_step_fn = step_for_epoch(epoch)
        lr_scale = controller.lr / lr_ref if lr_ref else 1.0
        train_set.set_epoch(epoch)
        t0 = time.time()
        use_mbr = mbr_enabled and epoch >= mbr_start
        if use_mbr:
            # MBR fine-tuning epoch (reference train.py:489-504): beam-search
            # n-best per batch, WER risks, expected-risk gradient step,
            # sub-epoch checkpoints
            mbr_sess = Speech2TextSession(
                model, params,
                DecodeConfig(beam_width=max(mbr_nbest, 4), n_best=mbr_nbest))
            from ...models.utils import np_pad_lists
            ck_interval = getattr(args, "mbr_ckpt_interval", 0)
            for i, batch in enumerate(train_set):
                mbr_sess.params = params
                nb_ys, nb_lens, risks = [], [], []
                for b in range(len(batch["utt_ids"])):
                    eo = mbr_sess.encode(batch["xs"][b:b + 1],
                                         batch["xlens"][b:b + 1])
                    _, nbest = mbr_sess._beam_one_las(
                        eo["ys"]["xs"], np.asarray(eo["ys"]["xlens"]))
                    nbest = (nbest + [nbest[-1] if nbest else [2]] *
                             mbr_nbest)[:mbr_nbest]
                    ref = batch["text"][b].split()
                    from ...evaluators.edit_distance import compute_wer
                    rk = [float(sum(compute_wer(
                        ref, train_set.idx2token(h).split())[1:]))
                        for h in nbest]
                    ys_p, yl_p = np_pad_lists(
                        [h or [2] for h in nbest], min_len=8)
                    nb_ys.append(ys_p)
                    nb_lens.append(yl_p)
                    risks.append(rk)
                umax = max(a.shape[1] for a in nb_ys)
                nb_ys = np.stack([np.pad(a, ((0, 0), (0, umax - a.shape[1])),
                                         constant_values=3) for a in nb_ys])
                params, opt_state, mloss = mbr_step(
                    params, opt_state,
                    jnp.asarray(batch["xs"]), jnp.asarray(batch["xlens"]),
                    jnp.asarray(nb_ys), jnp.asarray(np.stack(nb_lens)),
                    jnp.asarray(np.asarray(risks, np.float32)),
                    jnp.asarray(batch["ys"]), jnp.asarray(batch["ylens"]))
                reporter.add_observation({"loss": mloss})
                reporter.step_forward()
                if ck_interval and (i + 1) % ck_interval == 0:
                    save_checkpoint(save_dir, epoch, params, opt_state,
                                    controller.state_dict(),
                                    sub_step=i + 1)
        for i, batch in enumerate(train_set if not use_mbr else []):
            # jax.profiler trace window (SURVEY.md §5: the reference has no
            # profiler integration; we expose one via flags)
            pstart = getattr(args, "profile_start_step", 0)
            pn = getattr(args, "profile_n_steps", 0)
            if pn > 0 and reporter.step >= pstart and \
                    not getattr(reporter, "_tracing", False):
                jax.profiler.start_trace(os.path.join(save_dir, "trace"))
                reporter._tracing = True
                reporter._trace_end = reporter.step + pn
            rng, key = jax.random.split(rng)
            if rsp_prob > 0:
                if batch["xs"].shape[0] != jax.tree.leaves(
                        rsp_carry)[0].shape[0]:
                    rsp_carry = jax.tree.map(jnp.zeros_like, rsp_carry)
                params, opt_state, rsp_carry, metrics = epoch_step_fn(
                    params, opt_state, key, rsp_carry,
                    jnp.asarray(batch["xs"]), jnp.asarray(batch["xlens"]),
                    jnp.asarray(batch["ys"]), jnp.asarray(batch["ylens"]),
                    lr_scale)
            else:
                subs = {k: jnp.asarray(batch[k])
                        for k in ("ys_sub1", "ylens_sub1",
                                  "ys_sub2", "ylens_sub2",
                                  "trigger_points") if k in batch}
                if teacher_fn is not None:
                    subs["teacher_probs"] = teacher_fn(
                        jnp.asarray(batch["xs"]), jnp.asarray(batch["xlens"]),
                        jnp.asarray(batch["ys"]), jnp.asarray(batch["ylens"]))
                if mtl_tasks:
                    # one task per batch, round-robin (reference
                    # mtl_per_batch scheduling)
                    epoch_step_fn = step_for_epoch(
                        epoch, mtl_tasks[i % len(mtl_tasks)])
                params, opt_state, metrics = epoch_step_fn(
                    params, opt_state, key,
                    jnp.asarray(batch["xs"]), jnp.asarray(batch["xlens"]),
                    jnp.asarray(batch["ys"]), jnp.asarray(batch["ylens"]),
                    lr_scale, **subs)
            if getattr(reporter, "_tracing", False) and \
                    reporter.step + 1 >= reporter._trace_end:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                reporter._tracing = False
                args.profile_n_steps = 0
                logger.info("wrote profiler trace to %s",
                            os.path.join(save_dir, "trace"))
            reporter.add_observation(metrics)
            reporter.step_forward()
            if reporter.step % args.print_step == 0:
                logger.info(
                    "step %d (ep %d): loss %.3f (%.1f utt/s)",
                    reporter.step, epoch, float(metrics["loss"]),
                    (i + 1) * len(batch["utt_ids"]) / (time.time() - t0))

        # validation — jitted once; the loader's coarse padding grid keeps
        # the number of compiled shape variants small. Skipped (-> inf, so
        # never "best") before eval_start_epoch (reference train.py:329).
        dev_loss, n_batches = 0.0, 0
        dev_batches = dev_set \
            if epoch >= getattr(args, "eval_start_epoch", 1) else []
        if not dev_batches:
            dev_loss = float("inf")
        for batch in dev_batches:
            loss, obs = eval_step(
                params, jnp.asarray(batch["xs"]), jnp.asarray(batch["xlens"]),
                jnp.asarray(batch["ys"]), jnp.asarray(batch["ylens"]))
            reporter.add_observation(obs, is_eval=True)
            dev_loss += float(loss)
            n_batches += 1
        dev_loss /= max(n_batches, 1)
        # fine-tune switch to SGD (reference lr_scheduler.py:256-264)
        sgd_epoch = getattr(args, "convert_to_sgd_epoch", 0)
        if sgd_epoch and epoch == sgd_epoch:
            kw = controller.convert_to_sgd(getattr(args, "sgd_lr", 1e-4))
            tx = build_optimizer(kw["optimizer"], lr=kw["lr"],
                                 clip_grad_norm=args.clip_grad_norm)
            opt_state = tx.init(params)
            lr_ref = kw["lr"]
            _phase_steps.clear()
            step_fn = make_train_step(model, tx, mesh,
                                      compute_dtype=compute_dtype,
                                      tp_params=tp_shardings)
            _phase_steps[()] = step_fn
            logger.info("converted to SGD (lr %.2g) at epoch %d",
                        kw["lr"], epoch)
        actions = controller.step_epoch(dev_loss)
        row = reporter.epoch_summary(epoch, {"dev_loss_mean": dev_loss,
                                             "lr": actions["lr"]})
        logger.info("epoch %d: dev loss %.3f (%.1fs)%s", epoch, dev_loss,
                    time.time() - t0,
                    " *best*" if actions["is_best"] else "")
        keep = controller.topk_epochs(args.n_keep_best_checkpoints)
        save_checkpoint(save_dir, epoch, params, opt_state,
                        controller.state_dict(), keep_epochs=keep)
        reporter.snapshot()
        if actions["early_stop"]:
            logger.info("early stop at epoch %d", epoch)
            break
    return save_dir


if __name__ == "__main__":
    main()
