"""Same-process A/B of flagship train-step variants (fair: one worker).

Usage: python tools/ab_flagship.py [variant ...]
Variants: see VARIANTS (env toggles read at trace time).
Times each compiled step interleaved over several rounds so tunnel drift
hits all variants equally.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from bench import flagship_args, _preflight
from neural_sp_tpu.models.speech2text import build_speech2text
from neural_sp_tpu.parallel.mesh import make_train_step
from neural_sp_tpu.trainers.optimizer import build_optimizer
from neural_sp_tpu.trainers.lr_scheduler import noam_schedule

VARIANTS = {
    "base":       {"NSP_SCAN_LAYERS": "0"},
    "scan":       {"NSP_SCAN_LAYERS": "1"},
    # scan-unroll knobs (read at build time)
    "dec_u4":     {"NSP_DEC_UNROLL": "4"},
    "dec_u8":     {"NSP_DEC_UNROLL": "8"},
    "ctc_u8":     {"NSP_CTC_UNROLL": "8"},
    "u_all":      {"NSP_DEC_UNROLL": "8", "NSP_CTC_UNROLL": "8"},
    # rematerialization: recompute encoder-block internals in the backward
    # (r5 on-chip sweep: ALL remat variants lose to base at bs-64 — see
    # ROADMAP r5; kept for re-measurement on future chips)
    "remat":      {"NSP_ENC_REMAT": "1"},
    "remat_dots": {"NSP_ENC_REMAT": "1", "NSP_ENC_REMAT_POLICY": "dots"},
    "remat_nothing": {"NSP_ENC_REMAT": "1",
                      "NSP_ENC_REMAT_POLICY": "nothing"},
    "remat+scan": {"NSP_ENC_REMAT": "1", "NSP_SCAN_LAYERS": "1"},
    "remat_dots+scan": {"NSP_ENC_REMAT": "1",
                        "NSP_ENC_REMAT_POLICY": "dots",
                        "NSP_SCAN_LAYERS": "1"},
}


def force(tr):
    return float(jnp.ravel(jax.tree.leaves(tr)[0])[0])


def main():
    names = sys.argv[1:] or list(VARIANTS)
    _preflight()
    args = flagship_args()
    # bs from env (VERDICT r4 #2: run the sweep at the bs-64 microbatch)
    bs = int(os.environ.get("NSP_AB_BS", "16"))
    t, u = 1500, 100
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((bs, t, 80)), jnp.float32)
    xlens = jnp.full((bs,), t, jnp.int32)
    ys = jnp.asarray(rng.integers(4, args.vocab, (bs, u)), jnp.int32)
    ylens = jnp.full((bs,), u, jnp.int32)
    tx = build_optimizer("noam", schedule=noam_schedule(512, 25000, 5.0),
                         clip_grad_norm=5.0)
    runs = {}
    defaults = {"NSP_SCAN_LAYERS": "0",
                "NSP_DEC_UNROLL": "1", "NSP_CTC_UNROLL": "1",
                "NSP_ENC_REMAT": "0", "NSP_ENC_REMAT_POLICY": ""}
    # ONE shared params/opt_state: the variants only toggle compute-path
    # env knobs, the param tree is identical — sharing keeps bs-64 runs
    # inside HBM with several variants resident
    model0 = build_speech2text(args)
    v0 = model0.init(jax.random.PRNGKey(0), xs, xlens, ys, ylens)
    p, o = v0["params"], tx.init(v0["params"])
    for name in names:
        env = dict(defaults)
        env.update(VARIANTS[name])
        for k, v in env.items():
            os.environ[k] = v
        model = build_speech2text(args)
        step = make_train_step(model, tx, mesh=None, donate=False,
                               compute_dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        try:
            _, _, met = step(p, o, jax.random.PRNGKey(1), xs, xlens, ys,
                             ylens)
            force(met)
        except Exception as e:  # e.g. HBM OOM at this bs — skip, keep going
            msg = str(e).split("\n")[0][:200]
            print(f"[{name}] FAILED after {time.perf_counter()-t0:.0f}s: "
                  f"{msg}", flush=True)
            continue
        print(f"[{name}] compiled in {time.perf_counter()-t0:.0f}s "
              f"loss={met['loss']:.3f}", flush=True)
        runs[name] = step
    names = [n for n in names if n in runs]
    best = {n: float("inf") for n in names}
    key = jax.random.PRNGKey(2)
    for w in range(4):
        for name in names:
            step = runs[name]
            t0 = time.perf_counter()
            for i in range(12):
                _, _, met = step(p, o, jax.random.fold_in(key, w * 100 + i),
                                 xs, xlens, ys, ylens)
            force(met)
            dt = (time.perf_counter() - t0) / 12
            best[name] = min(best[name], dt)
            print(f"  round{w} {name}: {dt*1e3:.2f} ms", flush=True)
    print("---")
    for name in names:
        print(f"{name}: {best[name]*1e3:.2f} ms -> "
              f"{bs/best[name]:.1f} utts/s", flush=True)


if __name__ == "__main__":
    main()
