"""Long-sequence A/B for the two opt-in attention kernels (VERDICT r4 #5).

The fused rel-attention kernels (NSP_PALLAS_ATTN, NSP_FLASH) were kept
after r3/r4 measured them neutral/slower at the flagship's post-subsample
lengths (T=375), on the rationale "revisit for long-sequence work". This
builds that case: an UNSUBSAMPLED 12L conformer encoder (no conv frontend)
at T=1024/2048/3072, fwd+bwd, bf16 — the [B,H,T,T] f32 score materialization
the kernels exist to avoid grows quadratically here.

Usage: python tools/ab_longT.py [T ...]   (default: 1024 2048 3072)
Same-process interleaved timing like ab_flagship; exit(3) on a hung worker
(wrap with tools/retry_run.sh).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from bench import _preflight
from neural_sp_tpu.models.encoders.transformer import XformerEncoder

VARIANTS = {
    "base":   {"NSP_FLASH": "0", "NSP_PALLAS_ATTN": "0"},
    "flash":  {"NSP_FLASH": "1", "NSP_PALLAS_ATTN": "0"},
    "pallas": {"NSP_FLASH": "0", "NSP_PALLAS_ATTN": "1"},
}


def main():
    ts = [int(a) for a in sys.argv[1:]] or [1024, 2048, 3072]
    _preflight()
    results = {}
    for T in ts:
        # keep B*T*T*H f32 scores ~500 MB so the materialized baseline fits
        bs = max(16 * 1024 * 1024 // (T * T) // 8 * 8, 1)
        rng = np.random.default_rng(0)
        xs = jnp.asarray(rng.standard_normal((bs, T, 512)), jnp.bfloat16) \
            * 0.1
        xlens = jnp.full((bs,), T, jnp.int32)
        steps = {}
        for name, env in VARIANTS.items():
            for k, v in env.items():
                os.environ[k] = v
            enc = XformerEncoder(
                input_dim=512, btype="conformer", d_model=512, d_ff=2048,
                n_heads=8, n_layers=12, pe_type="relative", clamp_len=10,
                conv_kernel_size=15, dropout=0.0, dropout_att=0.0)
            if name == "base":
                v0 = enc.init(jax.random.PRNGKey(0), xs, xlens)
                params = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32 else x, v0["params"])

            def loss_fn(p, enc=enc):
                e = enc.apply({"params": p}, xs, xlens)
                return jnp.sum(e["ys"]["xs"].astype(jnp.float32) ** 2)

            step = jax.jit(jax.grad(loss_fn))
            t0 = time.perf_counter()
            try:
                g = step(params)
                float(jnp.ravel(jax.tree.leaves(g)[0])[0])
            except Exception as e:  # e.g. HBM/VMEM OOM at this T — skip
                msg = str(e).split("\n")[0][:200]
                print(f"[T={T} bs={bs} {name}] FAILED after "
                      f"{time.perf_counter()-t0:.0f}s: {msg}", flush=True)
                continue
            print(f"[T={T} bs={bs} {name}] compiled in "
                  f"{time.perf_counter()-t0:.0f}s", flush=True)
            steps[name] = step
        best = {n: float("inf") for n in steps}
        for w in range(3):
            for name, step in steps.items():
                t0 = time.perf_counter()
                for _ in range(4):
                    g = step(params)
                float(jnp.ravel(jax.tree.leaves(g)[0])[0])
                dt = (time.perf_counter() - t0) / 4
                best[name] = min(best[name], dt)
        for name, dt in best.items():
            print(f"T={T} bs={bs} {name}: {dt*1e3:.2f} ms/fwd+bwd", flush=True)
        results[T] = best
    print("--- summary ---")
    for T, best in results.items():
        base = best.get("base", float("nan"))
        for name, dt in best.items():
            print(f"T={T} {name}: {dt*1e3:.2f} ms ({base/dt:.2f}x vs base)",
                  flush=True)


if __name__ == "__main__":
    main()
