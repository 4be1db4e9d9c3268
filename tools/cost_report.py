"""Compiler-side cost accounting: flops + bytes-accessed for the flagship
step and its components, plus implied roofline times (compute at measured
164 TFLOP/s bf16, HBM at 819 GB/s). No timing — pure compile+analysis."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from bench import flagship_args, _preflight
from neural_sp_tpu.models.speech2text import build_speech2text
from neural_sp_tpu.parallel.mesh import make_train_step, cast_floating
from neural_sp_tpu.trainers.optimizer import build_optimizer
from neural_sp_tpu.trainers.lr_scheduler import noam_schedule


def report(name, lowered):
    c = lowered.compile()
    ca = c.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    fl = float(ca.get("flops", -1))
    by = float(ca.get("bytes accessed", -1))
    out = f"{name}: flops={fl/1e9:.1f}G bytes={by/1e9:.2f}GB"
    out += f" t_mxu={fl/164e12*1e3:.1f}ms t_hbm={by/819e9*1e3:.1f}ms"
    for k in sorted(ca):
        if "bytes accessed" in k and k != "bytes accessed":
            v = float(ca[k])
            if v > 1e8:
                out += f" [{k}={v/1e9:.2f}GB]"
    print(out, flush=True)


def main():
    _preflight()
    args = flagship_args()
    model = build_speech2text(args)
    bs, t, u = int(os.environ.get("NSP_AB_BS", "16")), 1500, 100
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((bs, t, 80)), jnp.float32)
    xlens = jnp.full((bs,), t, jnp.int32)
    ys = jnp.asarray(rng.integers(4, args.vocab, (bs, u)), jnp.int32)
    ylens = jnp.full((bs,), u, jnp.int32)
    v0 = model.init(jax.random.PRNGKey(0), xs, xlens, ys, ylens)
    params = v0["params"]
    tx = build_optimizer("noam", schedule=noam_schedule(512, 25000, 5.0),
                        clip_grad_norm=5.0)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, mesh=None, donate=False,
                           compute_dtype=jnp.bfloat16)
    abs_of = lambda tr: jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tr)
    key = jax.random.PRNGKey(0)
    batch = {"xs": xs, "xlens": xlens, "ys": ys, "ylens": ylens}

    low = step.jitted.lower(abs_of(params), abs_of(opt_state), abs_of(key),
                            abs_of(batch),
                            jax.ShapeDtypeStruct((), jnp.float32))
    report("full_step", low)

    def enc_step(p, k, xs, xlens):
        def loss_fn(p):
            pc = cast_floating(p, jnp.bfloat16)
            eouts, _ = model.apply(
                {"params": pc}, xs.astype(jnp.bfloat16), xlens, "all",
                False, rngs={"dropout": k,
                             "specaug": jax.random.fold_in(k, 1)},
                method=model.encode)
            h = eouts["ys"]["xs"].astype(jnp.float32)
            return jnp.mean(h * h)
        g = jax.grad(loss_fn)(p)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))
    report("enc_full_grads", jax.jit(enc_step).lower(
        abs_of(params), abs_of(key), abs_of(xs), abs_of(xlens)))

    # encoder fwd only
    def enc_fwd(p, xs, xlens):
        pc = cast_floating(p, jnp.bfloat16)
        eouts, _ = model.apply({"params": pc}, xs.astype(jnp.bfloat16),
                               xlens, "all", True, method=model.encode)
        return eouts["ys"]["xs"]
    report("enc_fwd", jax.jit(enc_fwd).lower(
        abs_of(params), abs_of(xs), abs_of(xlens)))

    # decoder-only step (teacher forced fwd+bwd, frozen eouts)
    ex = jax.ShapeDtypeStruct((bs, 188, 512), jnp.bfloat16)
    el = jax.ShapeDtypeStruct((bs,), jnp.int32)

    def dec_step(p, k, ex, el, ys, ylens):
        def loss_fn(p):
            pc = cast_floating(p, jnp.bfloat16)
            loss, obs = model.dec_fwd.apply(
                {"params": pc["dec_fwd"]}, ex, el, ys, ylens, False,
                rngs={"dropout": k})
            return loss.astype(jnp.float32)
        g = jax.grad(loss_fn)(p)
        return sum(jnp.sum(jnp.abs(x))
                   for x in jax.tree.leaves(g["dec_fwd"]))
    report("dec_full_grads", jax.jit(dec_step).lower(
        abs_of(params), abs_of(key), ex, el, abs_of(ys), abs_of(ylens)))

    def ctc_step(p, k, ex, el, ys, ylens):
        def loss_fn(p):
            pc = cast_floating(p, jnp.bfloat16)
            loss, _ = model.ctc.apply(
                {"params": pc["ctc"]}, ex, el, ys, ylens, False,
                rngs={"dropout": k})
            return loss.astype(jnp.float32)
        g = jax.grad(loss_fn)(p)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g["ctc"]))
    report("ctc_full_grads", jax.jit(ctc_step).lower(
        abs_of(params), abs_of(key), ex, el, abs_of(ys), abs_of(ylens)))

    import optax

    def opt_step(g, o, p):
        u, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, u), o2
    report("opt", jax.jit(opt_step).lower(
        abs_of(params), abs_of(opt_state), abs_of(params)))


if __name__ == "__main__":
    main()
