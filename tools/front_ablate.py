"""Conv-frontend-only fwd+bwd timing (the piece every enc_ablate mode
shares — suspected dominant fixed cost of the encoder step).

Modes:
  base     flagship frontend: 2x Conv2dBlock(32, 3x3, pool 2x2) @ [16,1500,80]
  bs8      half batch
  c64      64 channels (MXU lane use 2x)
  mm       im2col-as-matmul equivalent (same math, matmul formulation)
  specaug  SpecAugment alone
  cmvn     utterance CMVN alone

Usage: python tools/front_ablate.py [mode ...]
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from bench import _preflight
from neural_sp_tpu.parallel.mesh import cast_floating


def build(mode):
    from neural_sp_tpu.models.encoders.conv import ConvEncoder
    bs = 8 if mode == "bs8" else 16
    t = 1500
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((bs, t, 80)), jnp.float32)
    xlens = jnp.full((bs,), t, jnp.int32)

    if mode in ("specaug", "cmvn"):
        from neural_sp_tpu.ops.specaugment import spec_augment

        @jax.jit
        def step(p, k, xs, xlens):
            if mode == "specaug":
                h = spec_augment(k, xs, xlens, freq_width=27, n_freq_masks=2,
                                 time_width=100, n_time_masks=2,
                                 time_width_upper=1.0)
            else:
                m = jnp.mean(xs, axis=1, keepdims=True)
                s = jnp.std(xs, axis=1, keepdims=True) + 1e-5
                h = (xs - m) / s
            return jnp.sum(h * h)
        return step, {}, xs, xlens

    ch = "64_64" if mode == "c64" else "32_32"
    enc = ConvEncoder(input_dim=80, channels=ch,
                      kernel_sizes="(3,3)_(3,3)", poolings="(2,2)_(2,2)")
    params = enc.init(jax.random.PRNGKey(0), xs, xlens)["params"]

    @jax.jit
    def step(p, k, xs, xlens):
        def loss_fn(p):
            pc = cast_floating(p, jnp.bfloat16)
            h, _ = enc.apply({"params": pc}, xs.astype(jnp.bfloat16), xlens,
                             False, rngs={"dropout": k})
            return jnp.mean(jnp.square(h.astype(jnp.float32)))
        g = jax.grad(loss_fn)(p)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))
    return step, params, xs, xlens


def main():
    names = sys.argv[1:] or ["base", "bs8", "c64", "specaug", "cmvn"]
    from bench import _deadman
    _preflight()
    # per-compile watchdog: the pool can hand us a worker that hangs ANY
    # compile — preflight alone can't catch a mid-run degradation
    runs = {}
    for name in names:
        wd = _deadman(420, f"compile [{name}]")  # init + compile
        step, params, xs, xlens = build(name)
        t0 = time.perf_counter()
        float(step(params, jax.random.PRNGKey(0), xs, xlens))
        wd.cancel()
        print(f"[{name}] compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)
        runs[name] = (step, params, xs, xlens)

    best = {n: float("inf") for n in names}
    key = jax.random.PRNGKey(1)
    for w in range(3):
        for name in names:
            step, params, xs, xlens = runs[name]
            t0 = time.perf_counter()
            for i in range(12):
                out = step(params, jax.random.fold_in(key, w * 50 + i),
                           xs, xlens)
            float(out)
            dt = (time.perf_counter() - t0) / 12
            best[name] = min(best[name], dt)
            print(f"  round{w} {name}: {dt*1e3:.2f} ms", flush=True)
    print("---")
    for name in names:
        print(f"front [{name}]: {best[name]*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
