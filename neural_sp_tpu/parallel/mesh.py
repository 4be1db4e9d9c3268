"""Device mesh + sharded training step.

TPU-native replacement for the reference's DDP/NCCL stack (SURVEY.md §2.10:
``torch.distributed.launch`` + ``DistributedDataParallel``, gradient
allreduce in autograd, rank-striped samplers). Here the whole cluster runs
ONE jit program: the global batch is sharded over the ``data`` mesh axis,
parameters are replicated (optionally tensor-sharded over ``model``), and
XLA inserts the gradient psum over ICI.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over `data`."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Paired column->row tensor-parallel layout (Megatron-style; SURVEY §2.10 —
# the reference has no TP, this is the TPU-native extension). A block's
# UP-projection is column-sharded (output features split over `model`) and
# its DOWN-projection is row-sharded (input features split), so the hidden
# activation between them stays sharded and GSPMD inserts ONE all-reduce
# per block at the down-projection output instead of an all-gather after
# every matmul:
#   * FFN: w1 column -> w2 row;
#   * attention: w_query/w_key/w_value/w_pos column (head split) ->
#     w_out row;
#   * conformer conv: pointwise1 column -> depthwise channel-sharded ->
#     pointwise2 row;
#   * vocab heads (decoder `output`, CTC fc): column-sharded — the
#     softmax/log-softmax reduction over the sharded vocab dim becomes a
#     psum at the loss (GSPMD lowers the cross-entropy reduction without
#     materialising the gathered [B,T,V] logits).
# Biases of row-sharded layers stay replicated (added once after the
# all-reduce); GSPMD preserves exact semantics either way.
_TP_COLUMN = ("w1", "w_query", "w_key", "w_value", "w_pos", "pointwise1",
              "output", "key_proj", "key_proj_mono", "key_proj_chunk",
              "key_proj_value", "w_gen")
_TP_ROW = ("w2", "w_out", "pointwise2")
_TP_CHANNEL = ("depthwise",)


def _path_names(path) -> list[str]:
    out = []
    for k in path:
        out.append(getattr(k, "key", getattr(k, "name", str(k))))
    return out


def param_shardings(params, mesh: Mesh, min_size: int = 2 ** 16):
    """NamedSharding pytree for Megatron-style TP over the `model` axis.

    Kernels smaller than ``min_size`` elements or not divisible by the
    model-axis size stay replicated (the collective would cost more than
    the matmul).
    """
    n_model = mesh.shape["model"]

    def spec(path, x):
        if n_model <= 1 or not hasattr(x, "ndim") or x.ndim < 2 or \
                x.size < min_size:
            return NamedSharding(mesh, P())
        names = _path_names(path)
        leaf = names[-1]          # 'kernel' / 'bias' / 'embedding' / ...
        owner = names[-2] if len(names) >= 2 else ""
        if leaf != "kernel":
            return NamedSharding(mesh, P())
        if owner in _TP_COLUMN and x.shape[-1] % n_model == 0:
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1)), "model"))
        if owner in _TP_ROW and x.shape[0] % n_model == 0:
            return NamedSharding(
                mesh, P("model", *([None] * (x.ndim - 1))))
        if owner in _TP_CHANNEL and x.shape[-1] % n_model == 0:
            # depthwise conv kernel [K, 1, C]: channel split, no comm
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1)), "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def collective_stats(compiled) -> dict:
    """Count collectives + bytes moved in a compiled (sharded) step — the
    comm half of a TP/DP roofline. Parses the optimized HLO."""
    import re
    txt = compiled.as_text()
    stats = {"all-reduce": [0, 0], "all-gather": [0, 0],
             "reduce-scatter": [0, 0], "collective-permute": [0, 0],
             "all-to-all": [0, 0]}
    dtype_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                   "f64": 8, "pred": 1, "s8": 1, "u8": 1}
    shape_re = re.compile(r"(\w+)\[([\d,]*)\]")
    for line in txt.splitlines():
        m = re.search(r"=\s*(?:\([^)]*\)\s*)?(\w+)\[([\d,]*)\][^=]*"
                      r"(all-reduce|all-gather|reduce-scatter|"
                      r"collective-permute|all-to-all)", line)
        if not m:
            continue
        dt, dims, op = m.group(1), m.group(2), m.group(3)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        stats[op][0] += 1
        stats[op][1] += n * dtype_bytes.get(dt, 4)
    return {k: {"count": c, "bytes": b} for k, (c, b) in stats.items()
            if c > 0}


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place numpy batch arrays onto the mesh, batch-axis sharded."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) or isinstance(v, jnp.ndarray):
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def cast_floating(tree, dtype):
    """Cast every floating leaf of a pytree to ``dtype`` (ints untouched)."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def make_train_step(model, tx, mesh: Mesh | None = None,
                    donate: bool = True, weight_noise_std: float = 0.0,
                    compute_dtype=None, tp_params=None):
    """Build the jitted (sharded) training step.

    step(params, opt_state, rng, xs, xlens, ys, ylens, lr_scale=1.0)
      -> (params, opt_state, metrics dict)
    With a mesh: data-sharded inputs, replicated params; XLA inserts the
    gradient all-reduce. Without: plain single-device jit.
    ``weight_noise_std``: Gaussian weight noise on params in the loss only
    (reference add_weight_noise, models/base.py:77-91).
    ``lr_scale``: runtime multiplier on the optimizer updates — this is how
    the EpochController's decayed lr reaches the jitted step without
    rebuilding the optimizer (reference mutates optimizer.param_groups lr,
    lr_scheduler.py:131-225).
    ``compute_dtype``: mixed-precision policy (TPU-native replacement for
    the reference's AMP/apex O-levels, train.py:235-254). When set (e.g.
    jnp.bfloat16), params and inputs are cast to it inside the loss only —
    master params, optimizer state, and gradients stay f32; losses,
    softmaxes, and LayerNorm statistics upcast to f32 internally.
    """
    import optax

    def step(params, opt_state, rng, batch, lr_scale):
        def loss_fn(p):
            if weight_noise_std > 0:
                nkey = jax.random.fold_in(rng, 2)
                leaves, treedef = jax.tree.flatten(p)
                keys = jax.random.split(nkey, len(leaves))
                p = jax.tree.unflatten(treedef, [
                    x + weight_noise_std * jax.random.normal(
                        k, x.shape, x.dtype)
                    for x, k in zip(leaves, keys)])
            b = dict(batch)
            if compute_dtype is not None:
                p = cast_floating(p, compute_dtype)
                b["xs"] = b["xs"].astype(compute_dtype)
            loss, obs = model.apply(
                {"params": p}, deterministic=False,
                rngs={"dropout": rng, "specaug": jax.random.fold_in(rng, 1)},
                **b)
            scalars = {k: v.astype(jnp.float32) for k, v in obs.items()
                       if hasattr(v, "ndim") and v.ndim == 0}
            return loss.astype(jnp.float32), scalars
        (loss, scalars), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_updates, new_opt_state = tx.update(grads, opt_state, params)
        if hasattr(opt_state, "mini_step"):
            # gradient-accumulation state (efficient_multi_steps or
            # optax.MultiSteps): updates are all-zero on non-emit
            # microsteps, so cond the apply and skip the read+write pass
            # over every parameter on those steps
            emit = new_opt_state.gradient_step > opt_state.gradient_step
            params = jax.lax.cond(
                emit,
                lambda p: optax.apply_updates(
                    p, jax.tree.map(lambda u: u * lr_scale, new_updates)),
                lambda p: p,
                params)
        else:
            params = optax.apply_updates(
                params, jax.tree.map(lambda u: u * lr_scale, new_updates))
        opt_state = new_opt_state
        gnorm = optax.global_norm(grads)
        metrics = dict(scalars)
        metrics["grad_norm"] = gnorm
        return params, opt_state, metrics

    if mesh is None:
        jitted = jax.jit(step, donate_argnums=(0, 1) if donate else ())
    else:
        repl = replicated(mesh)
        data = batch_sharding(mesh)
        # tp_params: NamedSharding pytree from param_shardings() — params
        # live tensor-sharded over the `model` axis and XLA inserts the TP
        # collectives; the optimizer state is left unconstrained (None) so
        # sharding propagation matches each moment to its parameter
        p_sh = tp_params if tp_params is not None else repl
        o_sh = None if tp_params is not None else repl
        jitted = jax.jit(
            step,
            in_shardings=(p_sh, o_sh, repl, data, repl),
            out_shardings=(p_sh, o_sh, repl),
            donate_argnums=(0, 1) if donate else (),
        )

    def call(params, opt_state, rng, xs, xlens, ys, ylens, lr_scale=1.0,
             **sub_labels):
        """sub_labels: optional ys_sub1/ylens_sub1/ys_sub2/ylens_sub2 for
        hierarchical MTL (reference collate, asr/build.py:94-103)."""
        batch = {"xs": xs, "xlens": xlens, "ys": ys, "ylens": ylens}
        batch.update({k: v for k, v in sub_labels.items() if v is not None})
        return jitted(params, opt_state, rng, batch,
                      jnp.asarray(lr_scale, jnp.float32))

    call.jitted = jitted   # exposed for lowering/cost analysis tooling

    def lower(params, opt_state, rng, xs, xlens, ys, ylens, lr_scale):
        return jitted.lower(
            params, opt_state, rng,
            {"xs": xs, "xlens": xlens, "ys": ys, "ylens": ylens}, lr_scale)

    call._lower = lower  # AOT lowering access (bench cost analysis)
    return call


def make_rsp_train_step(model, tx, rsp_prob: float, mesh: Mesh | None = None,
                        compute_dtype=None):
    """Training step with Random State Passing: the RNN-encoder carry from
    the previous batch is re-used with probability ``rsp_prob`` (reference
    rnn.py:323-327), else reset to zeros.

    step(params, opt_state, rng, carry, xs, xlens, ys, ylens, lr_scale=1.0)
      -> (params, opt_state, new_carry, metrics)
    """
    import optax

    def step(params, opt_state, rng, carry, xs, xlens, ys, ylens, lr_scale):
        use = jax.random.bernoulli(jax.random.fold_in(rng, 3), rsp_prob)
        carry_in = jax.tree.map(
            lambda c: jnp.where(use, c, jnp.zeros_like(c)), carry)
        if compute_dtype is not None:
            carry_in = cast_floating(carry_in, compute_dtype)

        def loss_fn(p):
            xs_c = xs
            if compute_dtype is not None:
                p = cast_floating(p, compute_dtype)
                xs_c = xs.astype(compute_dtype)
            loss, obs, new_carry = model.apply(
                {"params": p}, xs_c, xlens, ys, ylens, carry_in, False,
                rngs={"dropout": rng, "specaug": jax.random.fold_in(rng, 1)},
                method=model.forward_with_carry)
            scalars = {k: v.astype(jnp.float32) for k, v in obs.items()
                       if hasattr(v, "ndim") and v.ndim == 0}
            return loss.astype(jnp.float32), (scalars, new_carry)

        (loss, (scalars, new_carry)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_carry = jax.tree.map(jax.lax.stop_gradient, new_carry)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(params, updates)
        metrics = dict(scalars)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, new_carry, metrics

    if mesh is None:
        jitted = jax.jit(step)
    else:
        repl = replicated(mesh)
        data = batch_sharding(mesh)
        jitted = jax.jit(
            step,
            in_shardings=(repl, repl, repl, data, data, data, data, data,
                          repl),
            out_shardings=(repl, repl, data, repl),
        )

    def call(params, opt_state, rng, carry, xs, xlens, ys, ylens,
             lr_scale=1.0):
        return jitted(params, opt_state, rng, carry, xs, xlens, ys, ylens,
                      jnp.asarray(lr_scale, jnp.float32))

    return call
