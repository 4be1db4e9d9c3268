"""Characterize the axon execution cost model: per-call cost vs top-level op
count, scan vs unrolled, elementwise fusion behavior."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax


def force(x):
    return float(jnp.ravel(x)[0])


def timeit(fn, *args, iters=5):
    force(fn(*args, jnp.float32(0.0)))
    t0 = time.perf_counter()
    for i in range(iters):
        o = fn(*args, jnp.float32(1e-3 * (i + 1)))
    force(o)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    s = jnp.ones((128,), jnp.float32)
    big = jnp.ones((16, 1500, 512), jnp.float32)

    for n in (1, 10, 50, 200):
        @jax.jit
        def f(x, k, n=n):
            for _ in range(n):
                x = jnp.sin(x) + k
            return x
        print(f"unrolled sin x{n} [128]: {timeit(f, s):8.2f} ms")

    @jax.jit
    def g(x, k):
        def body(c, _):
            return jnp.sin(c) + k, None
        out, _ = lax.scan(body, x, None, length=200)
        return out
    print(f"scan sin x200 [128]:     {timeit(g, s):8.2f} ms")

    @jax.jit
    def h(x, k):
        for _ in range(50):
            x = jnp.sin(x) + k
        return x
    print(f"unrolled sin x50 [16,1500,512]: {timeit(h, big):8.2f} ms")

    # mixed: 50 alternating LN-ish ops (mean/var reductions) — unfusable
    @jax.jit
    def m(x, k):
        for _ in range(20):
            mu = jnp.mean(x, -1, keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(
                jnp.mean((x - mu) ** 2, -1, keepdims=True) + 1e-6) + k
        return x
    print(f"20 layernorms [16,1500,512]: {timeit(m, big):8.2f} ms")

    # matmul + elementwise interleave (conformer-ish granularity)
    w = jnp.ones((512, 512), jnp.bfloat16)
    bigb = big.astype(jnp.bfloat16)

    @jax.jit
    def mm(x, k):
        for _ in range(10):
            x = jnp.maximum(x @ w * (1.0 / 512) + k.astype(jnp.bfloat16), 0)
        return x
    print(f"10x (matmul512+relu) [16,1500,512]: {timeit(mm, bigb):8.2f} ms "
          f"(flops-bound floor ~{10*2*16*1500*512*512/164e12*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
