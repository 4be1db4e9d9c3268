"""Decompose the flagship train-step cost on the real chip.

Times (forced-sync, EVERY dispatch content-unique — the axon tunnel dedupes
identical dispatches and coalesces in-flight duplicates; see ROADMAP
"Environment notes") the full step and ablated sub-graphs:
  full          the bench train step (enc + LAS dec + CTC + adam)
  enc_only      grad of mean(eouts) through the encoder alone
  dec_only      grad through the LAS decoder given fixed eouts
  ctc_only      grad through the CTC head given fixed eouts
  opt_only      adam update on precomputed grads
  nodrop        full model but all dropout probs = 0
  nospecaug     full model without SpecAugment
  enc_ctc       ctc_weight=1.0 (no attention decoder)
  enc_att       ctc_weight=0.0 (no CTC head)
  dedup         10 IDENTICAL full-step dispatches (measures the dedup-hit
                floor so other numbers can be sanity-checked)
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from bench import flagship_args, _preflight
from neural_sp_tpu.models.speech2text import build_speech2text
from neural_sp_tpu.parallel.mesh import make_train_step, cast_floating
from neural_sp_tpu.trainers.optimizer import build_optimizer
from neural_sp_tpu.trainers.lr_scheduler import noam_schedule

BS, T, U = int(os.environ.get("NSP_AB_BS", "16")), 1500, 100


def force(tree):
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.ravel(leaf)[0])


def data(seed=0):
    rng = np.random.default_rng(seed)
    xs = jnp.asarray(rng.standard_normal((BS, T, 80)), jnp.float32)
    xlens = jnp.full((BS,), T, jnp.int32)
    ys = jnp.asarray(rng.integers(4, 10000, (BS, U)), jnp.int32)
    ylens = jnp.full((BS,), U, jnp.int32)
    return xs, xlens, ys, ylens


_UNIQ = [0]


def time_fn(make_args, fn, iters=10, windows=3, unique=True):
    """fn(*make_args(uniq_int)). Every dispatch content-unique unless
    unique=False (dedup floor measurement)."""

    def nxt():
        if unique:
            _UNIQ[0] += 1
        return make_args(_UNIQ[0])

    force(fn(*nxt()))
    best = float("inf")
    for w in range(windows):
        argsl = [nxt() for _ in range(iters)]
        t0 = time.perf_counter()
        o = None
        for a in argsl:
            o = fn(*a)
        force(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def build(args_mod=None):
    args = flagship_args()
    if args_mod:
        args_mod(args)
    model = build_speech2text(args)
    xs, xlens, ys, ylens = data()
    variables = model.init(jax.random.PRNGKey(0), xs, xlens, ys, ylens)
    tx = build_optimizer("noam", schedule=noam_schedule(512, 25000, factor=5.0),
                         clip_grad_norm=5.0)
    params = variables["params"]
    opt_state = tx.init(params)
    step = make_train_step(model, tx, mesh=None, donate=False,
                           compute_dtype=jnp.bfloat16)
    return model, params, opt_state, tx, step


def main():
    _preflight()  # exit(3) on a hung compile worker so retry_run respawns
    which = sys.argv[1:] or ["full", "dedup", "enc_only", "dec_only",
                             "ctc_only", "opt_only"]
    res = {}
    key = jax.random.PRNGKey(0)

    mods = {
        "full": None,
        "nodrop": lambda a: [setattr(a, k, 0.0) for k in
                             ("dropout_enc", "dropout_att", "dropout_dec",
                              "dropout_emb")],
        "nospecaug": lambda a: [setattr(a, k, 0) for k in
                                ("n_freq_masks", "n_time_masks")],
        "enc_ctc": lambda a: setattr(a, "ctc_weight", 1.0),
        "enc_att": lambda a: setattr(a, "ctc_weight", 0.0),
    }
    for name in which:
        if name not in mods:
            continue
        model, params, opt_state, tx, step = build(mods[name])
        xs, xlens, ys, ylens = data()

        def fn(p, o, k, a, b, c, d):
            p2, o2, m = step(p, o, k, a, b, c, d)
            return m["loss"]

        res[name] = time_fn(
            lambda u: (params, opt_state, jax.random.fold_in(key, u),
                       xs, xlens, ys, ylens), fn)
        print(f"{name}: {res[name]:.2f} ms", flush=True)
        if name == "full" and "dedup" in which:
            res["dedup"] = time_fn(
                lambda u: (params, opt_state, jax.random.fold_in(key, u),
                           xs, xlens, ys, ylens), fn, unique=False)
            print(f"dedup: {res['dedup']:.2f} ms", flush=True)

    model, params, opt_state, tx, step = build()
    xs, xlens, ys, ylens = data()
    bf16_params = cast_floating(params, jnp.bfloat16)

    if "fwd_only" in which:
        @jax.jit
        def fwd(p, k, xs, xlens, ys, ylens):
            p = cast_floating(p, jnp.bfloat16)
            loss, obs = model.apply(
                {"params": p}, xs.astype(jnp.bfloat16), xlens, ys, ylens,
                deterministic=False,
                rngs={"dropout": k, "specaug": jax.random.fold_in(k, 1)})
            return loss.astype(jnp.float32)
        res["fwd_only"] = time_fn(
            lambda u: (params, jax.random.fold_in(key, u), xs, xlens, ys,
                       ylens), fwd)
        print(f"fwd_only: {res['fwd_only']:.2f} ms", flush=True)

    if "grad_noopt" in which:
        @jax.jit
        def gno(p, k, xs, xlens, ys, ylens):
            def loss_fn(p):
                pc = cast_floating(p, jnp.bfloat16)
                loss, obs = model.apply(
                    {"params": pc}, xs.astype(jnp.bfloat16), xlens, ys,
                    ylens, deterministic=False,
                    rngs={"dropout": k,
                          "specaug": jax.random.fold_in(k, 1)})
                return loss.astype(jnp.float32)
            loss, g = jax.value_and_grad(loss_fn)(p)
            return loss, g
        def fn_g(*a):
            loss, g = gno(*a)
            return loss
        res["grad_noopt"] = time_fn(
            lambda u: (params, jax.random.fold_in(key, u), xs, xlens, ys,
                       ylens), fn_g)
        print(f"grad_noopt: {res['grad_noopt']:.2f} ms", flush=True)

    if "enc_only" in which:
        @jax.jit
        def enc_step(p, k, xs, xlens):
            def loss_fn(p):
                p = cast_floating(p, jnp.bfloat16)
                eouts, _ = model.apply(
                    {"params": p}, xs.astype(jnp.bfloat16), xlens, "all",
                    False, rngs={"dropout": k,
                                 "specaug": jax.random.fold_in(k, 1)},
                    method=model.encode)
                return jnp.mean(eouts["ys"]["xs"].astype(jnp.float32))
            g = jax.grad(loss_fn)(p)
            return jax.tree.leaves(g)[0]
        res["enc_only"] = time_fn(
            lambda u: (params, jax.random.fold_in(key, u), xs, xlens),
            enc_step)
        print(f"enc_only: {res['enc_only']:.2f} ms", flush=True)

    # fixed eouts for dec/ctc-only runs (T'=188 after x8)
    eouts, _ = jax.jit(
        lambda p, x, xl: model.apply({"params": p}, x, xl, "all", True,
                                     method=model.encode))(
        bf16_params, xs.astype(jnp.bfloat16), xlens)
    ex = eouts["ys"]["xs"]
    el = eouts["ys"]["xlens"]
    force(ex)

    if "dec_only" in which:
        @jax.jit
        def dec_step(p, k, ex, el, ys, ylens):
            def loss_fn(p):
                p = cast_floating(p, jnp.bfloat16)
                loss, obs = model.dec_fwd.apply(
                    {"params": p["dec_fwd"]}, ex, el, ys, ylens, False,
                    rngs={"dropout": k})
                return loss.astype(jnp.float32)
            g = jax.grad(loss_fn)(p)
            return jax.tree.leaves(g["dec_fwd"])[0]
        res["dec_only"] = time_fn(
            lambda u: (params, jax.random.fold_in(key, u), ex, el, ys, ylens),
            dec_step)
        print(f"dec_only: {res['dec_only']:.2f} ms", flush=True)

    if "ctc_only" in which:
        @jax.jit
        def ctc_step(p, k, ex, el, ys, ylens):
            def loss_fn(p):
                p = cast_floating(p, jnp.bfloat16)
                loss, _ = model.ctc.apply(
                    {"params": p["ctc"]}, ex, el, ys, ylens, False,
                    rngs={"dropout": k})
                return loss.astype(jnp.float32)
            g = jax.grad(loss_fn)(p)
            return jax.tree.leaves(g["ctc"])[0]
        res["ctc_only"] = time_fn(
            lambda u: (params, jax.random.fold_in(key, u), ex, el, ys, ylens),
            ctc_step)
        print(f"ctc_only: {res['ctc_only']:.2f} ms", flush=True)

    if "opt_only" in which:
        @jax.jit
        def opt_step(g, o, p, s):
            g = jax.tree.map(lambda x: x * s, g)
            u, o2 = tx.update(g, o, p)
            p2 = optax.apply_updates(p, u)
            return jax.tree.leaves(p2)[0]
        grads = jax.tree.map(lambda x: x * 1e-4, params)
        res["opt_only"] = time_fn(
            lambda u: (grads, opt_state, params,
                       jnp.float32(1.0 + 1e-3 * u)), opt_step)
        print(f"opt_only: {res['opt_only']:.2f} ms", flush=True)

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
