"""Persistent XLA compilation cache for the CLIs.

JAX ships a persistent compilation cache but leaves it off by default;
for a training/eval framework whose CLIs are separate processes over the
same few programs (train step, eval beam, plots), enabling it makes every
invocation after the first start in seconds instead of tens of seconds —
and makes reruns robust on backends whose compile workers are flaky.

Opt-out with NSP_COMPILE_CACHE=0; override the directory with
NSP_COMPILE_CACHE=/path.
"""
from __future__ import annotations

import os


def preflight_or_exit(seconds: float = 75.0, code: int = 3) -> None:
    """Opt-in hung-compile-worker guard for the CLIs (NSP_PREFLIGHT=1).

    Remote compile pools can hand a process a worker that hangs ANY
    compile indefinitely (ROADMAP env notes); a recipe stage that draws
    one blocks the whole pipeline. When enabled, compile a trivial
    program under SIGALRM and exit(``code``) on timeout so a wrapper
    (e.g. examples/ci_test/run.sh's retry loop) can respawn the stage
    into a fresh worker. No-op on CPU backends and when NSP_PREFLIGHT
    is unset — pytest and library users are unaffected.
    """
    if os.environ.get("NSP_PREFLIGHT", "") != "1":
        return
    import signal
    import sys

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        return

    def _bail(signum, frame):
        print(f"preflight: trivial compile exceeded {seconds:.0f}s "
              f"(hung worker) -> exit({code})", file=sys.stderr, flush=True)
        os._exit(code)

    old = signal.signal(signal.SIGALRM, _bail)
    signal.alarm(int(seconds))
    try:
        x = jnp.ones((256, 256), jnp.float32)
        float(jnp.sum(x @ x))
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def enable_compile_cache() -> str | None:
    """Point jax at a persistent on-disk compilation cache. Returns the
    directory used, or None if disabled/unavailable."""
    flag = os.environ.get("NSP_COMPILE_CACHE", "")
    if flag == "0":
        return None
    cache_dir = flag or os.path.join(
        os.path.expanduser("~"), ".cache", "neural_sp_tpu", "xla")
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return cache_dir
    except Exception:
        return None
