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
