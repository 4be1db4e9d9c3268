"""Microbatch x grad-accum sweep at FIXED effective batch (384k frames).

The reference flagship conf trains with batch_size 24000 frames +
accum_grad_n_steps 16 (conformer_..._large.yaml) -> effective batch
384,000 frames per optimizer update; the 24k microbatch is purely the
24GB-GPU memory ceiling. On TPU we can raise the per-dispatch microbatch
and lower the accum count with IDENTICAL optimization semantics
(gradient accumulation is linear). This sweep measures utts/s over full
accumulation cycles for candidate (bs, k) pairs.

Usage: python tools/accum_sweep.py [bs:k ...]   default 16:16 32:8 64:4
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from bench import flagship_args
from neural_sp_tpu.models.speech2text import build_speech2text
from neural_sp_tpu.parallel.mesh import make_train_step
from neural_sp_tpu.trainers.optimizer import build_optimizer
from neural_sp_tpu.trainers.lr_scheduler import noam_schedule


def force(tr):
    return float(jnp.ravel(jax.tree.leaves(tr)[0])[0])


def main():
    from bench import _preflight
    _preflight()
    pairs = [tuple(int(v) for v in s.split(":")) for s in sys.argv[1:]] \
        or [(16, 16), (32, 8), (64, 4)]
    args = flagship_args()
    model = build_speech2text(args)
    t, u = 1500, 100
    rng = np.random.default_rng(0)
    for bs, k in pairs:
        xs = jnp.asarray(rng.standard_normal((bs, t, 80)), jnp.float32)
        xlens = jnp.full((bs,), t, jnp.int32)
        ys = jnp.asarray(rng.integers(4, args.vocab, (bs, u)), jnp.int32)
        ylens = jnp.full((bs,), u, jnp.int32)
        tx = build_optimizer(
            "noam", schedule=noam_schedule(512, 25000, 5.0),
            clip_grad_norm=5.0, accum_grad_n_steps=k)
        variables = model.init(jax.random.PRNGKey(0), xs, xlens, ys, ylens)
        params = variables["params"]
        opt_state = tx.init(params)
        step = make_train_step(model, tx, mesh=None, donate=True,
                               compute_dtype=jnp.bfloat16)
        key = jax.random.PRNGKey(bs)
        # run one full accumulation cycle so the apply-step cost (optimizer
        # update) is exercised before timing (jit compiles both lax.cond
        # branches regardless; this is about warm execution, not compile)
        for i in range(k):
            params, opt_state, _ = step(
                params, opt_state, jax.random.fold_in(key, 1000 + i),
                xs, xlens, ys, ylens)
        force(params)
        best = float("inf")
        iters = 2 * k  # whole accumulation cycles only
        for w in range(3):
            t0 = time.perf_counter()
            for i in range(iters):
                params, opt_state, _ = step(
                    params, opt_state, jax.random.fold_in(key, w * 100 + i),
                    xs, xlens, ys, ylens)
            force(params)
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"bs={bs} k={k} (eff {bs*t*k//1000}k frames): "
              f"{best*1e3:.2f} ms/microstep -> {bs/best:.1f} utts/s "
              f"({bs*t/best/1e3:.0f}k frames/s)", flush=True)


if __name__ == "__main__":
    main()
