"""Validate the flash-attention rel-MHA path vs the materialized path on
the real TPU (outputs + parameter gradients), then time the flagship."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from bench import _preflight


def main():
    _preflight()
    from neural_sp_tpu.models.modules.relative_multihead_attention import (
        RelativeMultiheadAttention)

    rng = np.random.default_rng(0)
    bs, t, d, h = 2, 200, 512, 8
    xs = jnp.asarray(rng.standard_normal((bs, t, d)), jnp.float32)
    mask = jnp.asarray(
        np.arange(t)[None] < np.asarray([t, t - 37])[:, None])
    mask3 = jnp.broadcast_to(mask[:, None, :], (bs, t, t))
    m = RelativeMultiheadAttention(d_model=d, n_heads=h, clamp_len=10,
                                   xl_like=False)
    v = m.init(jax.random.PRNGKey(0), xs)

    def run(p, flash):
        os.environ["NSP_FLASH"] = "1" if flash else "0"

        def f(p):
            out, _, _ = m.apply({"params": p}, xs, mask=mask3)
            return jnp.sum(out.astype(jnp.float32) ** 2), out
        (loss, out), g = jax.value_and_grad(f, has_aux=True)(p)
        return loss, out, g

    l1, o1, g1 = run(v["params"], flash=True)
    l2, o2, g2 = run(v["params"], flash=False)
    o1, o2 = np.asarray(o1), np.asarray(o2)
    print("out max|diff|:", float(np.abs(o1 - o2).max()),
          " rel:", float(np.abs(o1 - o2).max() / (np.abs(o2).max() + 1e-9)))
    # denominate by a GLOBAL grad scale: leaves whose true gradient is
    # mathematically ~0 (w_key.bias — a constant key shift cancels in
    # softmax) otherwise divide rounding noise by rounding noise
    gscale = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(g2))
    gd = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()) /
                      max(float(jnp.abs(b).max()), 1e-2 * gscale), g1, g2)
    flat, _ = jax.tree_util.tree_flatten_with_path(gd)
    for path, val in flat:
        print("  grad rel", jax.tree_util.keystr(path), round(val, 5))
    worst = max(jax.tree.leaves(gd))
    print("grad worst rel diff:", worst)
    assert float(np.abs(o1 - o2).max()) < 2e-2, "flash output mismatch"
    assert worst < 5e-2, f"flash grad mismatch {worst}"
    print("FLASH PARITY OK", flush=True)

    # flagship step timing with flash
    os.environ["NSP_FLASH"] = "1"
    from bench import flagship_args
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.parallel.mesh import make_train_step
    from neural_sp_tpu.trainers.optimizer import build_optimizer
    from neural_sp_tpu.trainers.lr_scheduler import noam_schedule
    args = flagship_args()
    model = build_speech2text(args)
    bs, t, u = 16, 1500, 100
    xs = jnp.asarray(rng.standard_normal((bs, t, 80)), jnp.float32)
    xlens = jnp.full((bs,), t, jnp.int32)
    ys = jnp.asarray(rng.integers(4, args.vocab, (bs, u)), jnp.int32)
    ylens = jnp.full((bs,), u, jnp.int32)
    v = model.init(jax.random.PRNGKey(0), xs, xlens, ys, ylens)
    tx = build_optimizer("noam", schedule=noam_schedule(512, 25000, 5.0),
                         clip_grad_norm=5.0)
    p, o = v["params"], tx.init(v["params"])
    step = make_train_step(model, tx, mesh=None, donate=True,
                           compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    p, o, met = step(p, o, key, xs, xlens, ys, ylens)
    float(jnp.ravel(jax.tree.leaves(p)[0])[0])
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(15):
            p, o, met = step(p, o, jax.random.fold_in(key, w * 100 + i),
                             xs, xlens, ys, ylens)
        float(jnp.ravel(jax.tree.leaves(p)[0])[0])
        best = min(best, (time.perf_counter() - t0) / 15)
    print(f"flagship WITH FLASH: {best*1e3:.2f} ms -> {16/best:.1f} utts/s")


if __name__ == "__main__":
    main()
