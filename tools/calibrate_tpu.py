"""Measure achievable matmul TFLOP/s + per-dispatch floor on the chip."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp


def force(x):
    return float(jnp.ravel(x)[0])


def main():
    print("device:", jax.devices()[0].device_kind)
    n = 8192
    a = jnp.asarray(np.random.randn(n, n), jnp.bfloat16)

    @jax.jit
    def chain(a, k):
        x = a
        for _ in range(8):
            x = (x @ a) * (1.0 / n) + k
        return x

    force(chain(a, jnp.bfloat16(0.0)))
    t0 = time.perf_counter()
    iters = 5
    for i in range(iters):
        o = chain(a, jnp.bfloat16(1e-3 * (i + 1)))
    force(o)
    dt = (time.perf_counter() - t0) / iters
    fl = 8 * 2 * n ** 3
    print(f"matmul chain: {dt*1e3:.2f} ms -> {fl/dt/1e12:.1f} TFLOP/s")

    # f32 for comparison
    a32 = a.astype(jnp.float32)
    force(chain(a32, jnp.float32(0.0)))
    t0 = time.perf_counter()
    for i in range(iters):
        o = chain(a32, jnp.float32(1e-3 * (i + 1)))
    force(o)
    dt32 = (time.perf_counter() - t0) / iters
    print(f"f32 chain: {dt32*1e3:.2f} ms -> {fl/dt32/1e12:.1f} TFLOP/s")

    # tiny-dispatch floor: many tiny fused ops in one program
    @jax.jit
    def tiny(x, k):
        for _ in range(200):
            x = jnp.sin(x) + k
        return x

    s = jnp.ones((128,), jnp.float32)
    force(tiny(s, 0.0))
    t0 = time.perf_counter()
    for i in range(iters):
        o = tiny(s, jnp.float32(1e-3 * i))
    force(o)
    dts = (time.perf_counter() - t0) / iters
    print(f"200 tiny seq ops: {dts*1e3:.3f} ms -> {dts/200*1e6:.1f} us/op")

    # dispatch latency floor
    @jax.jit
    def noop(x):
        return x + 1.0
    force(noop(s))
    t0 = time.perf_counter()
    for i in range(20):
        s = noop(s)
    force(s)
    print(f"dispatch floor: {(time.perf_counter()-t0)/20*1e3:.3f} ms")


if __name__ == "__main__":
    main()
