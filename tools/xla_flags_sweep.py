"""Sweep XLA TPU flags on the flagship train step.

XLA_FLAGS must be set before backend init, so each variant runs as a
SUBPROCESS (one compile + timing loop each); the parent interleaves
nothing — tunnel drift between variants is handled by re-running base
between candidates and normalising.

Usage: python tools/xla_flags_sweep.py            # sweep all
       python tools/xla_flags_sweep.py <name>     # child mode (internal)
"""
import os
import subprocess
import sys

FLAG_SETS = {
    "base": "",
    "lhs": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "async_all": "--xla_tpu_enable_async_collective_fusion=true",
    "vmem_big": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "spmd_thresh": "--xla_tpu_dot_dot_fusion_duplicated=true",
    "flash_opt": "--xla_tpu_enable_dot_strength_reduction=false",
}


def child(name: str):
    import time
    import numpy as np
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import flagship_args, _preflight
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.parallel.mesh import make_train_step
    from neural_sp_tpu.trainers.optimizer import build_optimizer
    from neural_sp_tpu.trainers.lr_scheduler import noam_schedule

    _preflight()
    args = flagship_args()
    # bs from env (VERDICT r4 #2: sweep at the bs-64 production microbatch)
    bs = int(os.environ.get("NSP_AB_BS", "16"))
    t, u = 1500, 100
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((bs, t, 80)), jnp.float32)
    xlens = jnp.full((bs,), t, jnp.int32)
    ys = jnp.asarray(rng.integers(4, args.vocab, (bs, u)), jnp.int32)
    ylens = jnp.full((bs,), u, jnp.int32)
    model = build_speech2text(args)
    v0 = model.init(jax.random.PRNGKey(0), xs, xlens, ys, ylens)
    tx = build_optimizer("noam", schedule=noam_schedule(512, 25000, 5.0),
                         clip_grad_norm=5.0)
    p, o = v0["params"], tx.init(v0["params"])
    step = make_train_step(model, tx, mesh=None, donate=False,
                           compute_dtype=jnp.bfloat16)

    def force(tr):
        return float(jnp.ravel(jax.tree.leaves(tr)[0])[0])

    t0 = time.perf_counter()
    _, _, met = step(p, o, jax.random.PRNGKey(1), xs, xlens, ys, ylens)
    force(met)
    print(f"[{name}] compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    key = jax.random.PRNGKey(2)
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(12):
            _, _, met = step(p, o, jax.random.fold_in(key, w * 100 + i),
                             xs, xlens, ys, ylens)
        force(met)
        best = min(best, (time.perf_counter() - t0) / 12)
    print(f"RESULT {name}: {best*1e3:.2f} ms", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] in FLAG_SETS and \
            os.environ.get("_SWEEP_CHILD") == "1":
        child(sys.argv[1])
        return
    for name, flags in FLAG_SETS.items():
        env = dict(os.environ)
        env["_SWEEP_CHILD"] = "1"
        base = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (base + " " + flags).strip()
        for attempt in range(3):
            r = subprocess.run([sys.executable, os.path.abspath(__file__),
                                name], env=env, timeout=2400)
            if r.returncode == 0:
                break
            print(f"{name}: rc={r.returncode}, retrying", flush=True)


if __name__ == "__main__":
    main()
