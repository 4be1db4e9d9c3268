"""LAS-decoder-only fwd+bwd ablations (fixed eouts), one process.

Hypothesis probes for the ~13 ms dec_only cost:
  * weight traffic: the scan re-reads the LSTM/attention weights from HBM
    every step and round-trips the dW accumulators -> time should scale
    ~with weight bytes (n_units), not with per-step FLOPs alone.
  * unroll: fewer loop iterations -> fewer dW round-trips IF XLA
    accumulates per body; measured at the full-step level as neutral,
    re-measured here in isolation.
  * attention type: location (conv+energy per step) vs dot (one matmul).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from bench import flagship_args, _preflight
from neural_sp_tpu.models.speech2text import build_speech2text
from neural_sp_tpu.parallel.mesh import cast_floating

BS, T, U = 16, 1500, 100

MODES = {
    "base": {},
    "u512": {"dec_n_units": 512},
    "u256": {"dec_n_units": 256},
    "dot": {"attn_type": "dot"},
    "add": {"attn_type": "add"},
    "conv9": {"attn_conv_width": 9},
    "adim128": {"attn_dim": 128},
    "emb128": {"emb_dim": 128},
    "remat": {"_env": {"NSP_DEC_REMAT": "1"}},
    "xlaconv": {"_env": {"NSP_LOC_CONV": "xla"}},
    "unroll4": {"_env": {"NSP_DEC_UNROLL": "4"}},
    "unroll10": {"_env": {"NSP_DEC_UNROLL": "10"}},
    "u50": {"_u": 50},
}


def main():
    names = sys.argv[1:] or list(MODES)
    _preflight()
    runs = {}
    for name in names:
        mode = dict(MODES[name])
        env = {"NSP_DEC_UNROLL": "1", "NSP_DEC_REMAT": "0",
               "NSP_LOC_CONV": ""}
        env.update(mode.pop("_env", {}))
        u = mode.pop("_u", U)
        for k, v in env.items():
            os.environ[k] = v
        args = flagship_args()
        for k, v in mode.items():
            setattr(args, k, v)
        model = build_speech2text(args)
        rng = np.random.default_rng(0)
        xs = jnp.asarray(rng.standard_normal((BS, T, 80)), jnp.float32)
        xlens = jnp.full((BS,), T, jnp.int32)
        ys = jnp.asarray(rng.integers(4, args.vocab, (BS, u)), jnp.int32)
        ylens = jnp.full((BS,), u, jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), xs, xlens, ys, ylens)
        params = variables["params"]
        bf16 = cast_floating(params, jnp.bfloat16)
        eouts, _ = jax.jit(
            lambda p, x, xl: model.apply({"params": p}, x, xl, "all", True,
                                         method=model.encode))(
            bf16, xs.astype(jnp.bfloat16), xlens)
        ex, el = eouts["ys"]["xs"], eouts["ys"]["xlens"]

        @jax.jit
        def dec_step(p, k, ex, el, ys, ylens, model=model):
            def loss_fn(p):
                p = cast_floating(p, jnp.bfloat16)
                loss, obs = model.dec_fwd.apply(
                    {"params": p["dec_fwd"]}, ex, el, ys, ylens, False,
                    rngs={"dropout": k})
                return loss.astype(jnp.float32)
            g = jax.grad(loss_fn)(p)
            return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        float(dec_step(params, key, ex, el, ys, ylens))
        print(f"[{name}] compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)
        runs[name] = (dec_step, params, ex, el, ys, ylens)
        os.environ["NSP_DEC_UNROLL"] = "1"
        os.environ["NSP_DEC_REMAT"] = "0"
        os.environ["NSP_LOC_CONV"] = ""

    best = {n: float("inf") for n in names}
    key = jax.random.PRNGKey(1)
    for w in range(3):
        for name in names:
            dec_step, params, ex, el, ys, ylens = runs[name]
            t0 = time.perf_counter()
            for i in range(15):
                out = dec_step(params, jax.random.fold_in(key, w * 50 + i),
                               ex, el, ys, ylens)
            float(out)
            dt = (time.perf_counter() - t0) / 15
            best[name] = min(best[name], dt)
            print(f"  round{w} {name}: {dt*1e3:.2f} ms", flush=True)
    print("---")
    for name in names:
        print(f"dec fwd+bwd [{name}]: {best[name]*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
