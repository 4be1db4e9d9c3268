"""Measure the flagship step under scan-unroll settings (run as separate
processes; env: NSP_CTC_UNROLL / NSP_DEC_UNROLL)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from bench import flagship_args, _preflight
from neural_sp_tpu.models.speech2text import build_speech2text
from neural_sp_tpu.parallel.mesh import make_train_step
from neural_sp_tpu.trainers.optimizer import build_optimizer
from neural_sp_tpu.trainers.lr_scheduler import noam_schedule


def main():
    _preflight()
    args = flagship_args()
    model = build_speech2text(args)
    bs, t, u = 16, 1500, 100
    rng = np.random.default_rng(0)
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
    p, o, m = step(p, o, key, xs, xlens, ys, ylens)
    float(jnp.ravel(jax.tree.leaves(p)[0])[0])
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(15):
            p, o, m = step(p, o, jax.random.fold_in(key, w * 100 + i),
                           xs, xlens, ys, ylens)
        float(jnp.ravel(jax.tree.leaves(p)[0])[0])
        best = min(best, (time.perf_counter() - t0) / 15)
    print(f"ctc_unroll={os.environ.get('NSP_CTC_UNROLL', '1')} "
          f"dec_unroll={os.environ.get('NSP_DEC_UNROLL', '1')}: "
          f"{best*1e3:.2f} ms -> {bs/best:.1f} utts/s", flush=True)


if __name__ == "__main__":
    main()
