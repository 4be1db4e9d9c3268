"""Encoder-only fwd+bwd ablations (full param grads, no DCE).

Usage: python tools/enc_ablate.py [mode ...]   (default: a useful set)
All modes run in ONE process, interleaved over rounds, so the tunnel's
drift and the compile-worker lottery hit every mode equally.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from bench import flagship_args, _preflight
from neural_sp_tpu.models.speech2text import build_speech2text
from neural_sp_tpu.parallel.mesh import cast_floating

MODES = {
    "base": lambda a: None,
    # score-tensor traffic scales with H; matmul FLOPs don't
    "h1": lambda a: setattr(a, "transformer_n_heads", 1),
    # absolute PE: no rel table / one-hot contraction machinery
    "pe_add": lambda a: setattr(a, "transformer_enc_pe_type", "add"),
    # unclamped rel-PE: skew path instead of one-hot
    "noclamp": lambda a: setattr(a, "transformer_enc_clamp_len", -1),
    # plain transformer block: no conv module, single FFN
    "transformer": lambda a: setattr(a, "enc_type", "conv_transformer"),
    "dff512": lambda a: setattr(a, "transformer_d_ff", 512),
    "nodrop": lambda a: setattr(a, "dropout_enc", 0.0),
    # depthwise conv kernel 15 -> 1: isolates the depthwise conv's
    # (notoriously bad-backward) share; pointwise matmuls unchanged
    "convk1": lambda a: setattr(a, "conformer_kernel_size", 1),
    # all x8 subsampling inside the conv frontend: every block at T=188
    "allconv8": lambda a: (setattr(a, "conv_channels", "32_32_32"),
                           setattr(a, "conv_kernel_sizes",
                                   "(3,3)_(3,3)_(3,3)"),
                           setattr(a, "conv_poolings", "(2,2)_(2,2)_(2,2)"),
                           setattr(a, "subsample", "1" * 12 and
                                   "_".join(["1"] * 12))),
    # half batch: dispatch/latency floor vs linear-in-B work
    "bs8": lambda a: None,
}


def main():
    names = sys.argv[1:] or ["base", "h1", "pe_add", "transformer",
                             "nodrop", "allconv8", "bs8"]
    _preflight()
    runs = {}
    for name in names:
        args = flagship_args()
        MODES[name](args)
        args.ctc_weight = 1.0  # no LAS decoder built
        bs_env = int(os.environ.get("NSP_AB_BS", "16"))
        bs = bs_env // 2 if name == "bs8" else bs_env
        t = 1500
        rng = np.random.default_rng(0)
        xs = jnp.asarray(rng.standard_normal((bs, t, 80)), jnp.float32)
        xlens = jnp.full((bs,), t, jnp.int32)
        ys = jnp.asarray(rng.integers(4, args.vocab, (bs, 100)), jnp.int32)
        ylens = jnp.full((bs,), 100, jnp.int32)
        model = build_speech2text(args)
        v = model.init(jax.random.PRNGKey(0), xs, xlens, ys, ylens)
        params = v["params"]

        @jax.jit
        def enc_step(p, k, xs, xlens, model=model):
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
            return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        float(enc_step(params, key, xs, xlens))
        print(f"[{name}] compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)
        runs[name] = (enc_step, params, xs, xlens)

    best = {n: float("inf") for n in names}
    key = jax.random.PRNGKey(1)
    for w in range(3):
        for name in names:
            enc_step, params, xs, xlens = runs[name]
            t0 = time.perf_counter()
            for i in range(12):
                out = enc_step(params, jax.random.fold_in(key, w * 50 + i),
                               xs, xlens)
            float(out)
            dt = (time.perf_counter() - t0) / 12
            best[name] = min(best[name], dt)
            print(f"  round{w} {name}: {dt*1e3:.2f} ms", flush=True)
    print("---")
    for name in names:
        print(f"enc fwd+bwd [{name}]: {best[name]*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
