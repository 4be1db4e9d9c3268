"""Encoder-only fwd+bwd ablations (full param grads, no DCE)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from bench import flagship_args, _preflight
from neural_sp_tpu.models.speech2text import build_speech2text
from neural_sp_tpu.parallel.mesh import cast_floating


def main():
    _preflight()
    mode = sys.argv[1] if len(sys.argv) > 1 else "base"
    args = flagship_args()
    if mode == "h1":
        args.transformer_n_heads = 1
    elif mode == "noconv":
        args.conformer_kernel_size = 0   # may not be supported; probe
    elif mode == "dff512":
        args.transformer_d_ff = 512
    args.ctc_weight = 1.0  # no LAS decoder built
    model = build_speech2text(args)
    bs, t = 16, 1500
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((bs, t, 80)), jnp.float32)
    xlens = jnp.full((bs,), t, jnp.int32)
    ys = jnp.asarray(rng.integers(4, args.vocab, (bs, 100)), jnp.int32)
    ylens = jnp.full((bs,), 100, jnp.int32)
    v = model.init(jax.random.PRNGKey(0), xs, xlens, ys, ylens)
    params = v["params"]

    @jax.jit
    def enc_step(p, k, xs, xlens):
        def loss_fn(p):
            pc = cast_floating(p, jnp.bfloat16)
            eouts, _ = model.apply(
                {"params": pc}, xs.astype(jnp.bfloat16), xlens, "all",
                False, rngs={"dropout": k,
                             "specaug": jax.random.fold_in(k, 1)},
                method=model.encode)
            h = eouts["ys"]["xs"].astype(jnp.float32)
            return jnp.mean(h * h)   # full grads, nothing DCE-able
        g = jax.grad(loss_fn)(p)
        # force EVERY grad leaf to be an output (sum of norms)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    key = jax.random.PRNGKey(0)
    out = enc_step(params, key, xs, xlens)
    float(out)
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(15):
            out = enc_step(params, jax.random.fold_in(key, w * 50 + i),
                           xs, xlens)
        float(out)
        best = min(best, (time.perf_counter() - t0) / 15)
    print(f"enc fwd+bwd [{mode}]: {best*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
