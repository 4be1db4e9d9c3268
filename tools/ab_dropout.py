"""A/B: flagship bench step with threefry dropout vs cheap-hash dropout."""
import sys, os, time, math
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import flax.linen as nn


def fast_uniform(key, shape, dtype=jnp.float32):
    """Low-op-count counter-based uniform bits (murmur-style finalizer).
    NOT crypto-grade — dropout only."""
    kd = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    n = int(np.prod(shape)) if shape else 1
    x = lax.iota(jnp.uint32, n)
    x = x * jnp.uint32(0x9E3779B9) + kd[0]
    x = x ^ (x >> 16)
    x = x * (jnp.uint32(0x7FEB352D) ^ kd[-1])
    x = x ^ (x >> 15)
    return ((x >> 8).astype(dtype) * dtype(1.0 / 16777216.0)).reshape(shape)


def patch_dropout():
    def fast_call(self, inputs, deterministic=None, rng=None):
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic)
        if (self.rate == 0.0) or deterministic:
            return inputs
        if self.rate == 1.0:
            return jnp.zeros_like(inputs)
        keep_prob = 1.0 - self.rate
        if rng is None:
            rng = self.make_rng(self.rng_collection)
        u = fast_uniform(rng, inputs.shape)
        mask = u < keep_prob
        return jnp.where(mask, inputs / keep_prob,
                         jnp.zeros_like(inputs))
    nn.Dropout.__call__ = fast_call


def run_bench():
    from bench import flagship_args
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.parallel.mesh import make_train_step
    from neural_sp_tpu.trainers.optimizer import build_optimizer
    from neural_sp_tpu.trainers.lr_scheduler import noam_schedule

    args = flagship_args()
    model = build_speech2text(args)
    bs, t, u = 16, 1500, 100
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((bs, t, 80)), jnp.float32)
    xlens = jnp.full((bs,), t, jnp.int32)
    ys = jnp.asarray(rng.integers(4, args.vocab, (bs, u)), jnp.int32)
    ylens = jnp.full((bs,), u, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), xs, xlens, ys, ylens)
    tx = build_optimizer("noam", schedule=noam_schedule(512, 25000, 5.0),
                         clip_grad_norm=5.0)
    params = variables["params"]
    opt_state = tx.init(params)
    step = make_train_step(model, tx, mesh=None, donate=True,
                           compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    def force(tr):
        return float(jnp.ravel(jax.tree.leaves(tr)[0])[0])

    params, opt_state, m = step(params, opt_state, key, xs, xlens, ys, ylens)
    force(params)
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(15):
            params, opt_state, m = step(params, opt_state,
                                        jax.random.fold_in(key, w * 100 + i),
                                        xs, xlens, ys, ylens)
        force(params)
        best = min(best, (time.perf_counter() - t0) / 15)
    return best * 1e3


if __name__ == "__main__":
    if "fast" in sys.argv:
        patch_dropout()
        print("mode: fast-hash dropout")
    else:
        print("mode: threefry dropout")
    print(f"step: {run_bench():.2f} ms")
