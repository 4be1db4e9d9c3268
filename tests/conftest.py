"""Test configuration: force an 8-device virtual CPU mesh.

The reference has no multi-device tests (SURVEY.md §4); we add them via XLA
host-platform device simulation so every sharding path is exercised in CI.

Note: under the axon TPU tunnel, a sitecustomize hook pre-imports jax with
JAX_PLATFORMS=axon, so env vars alone are not enough — we also update the
live jax config before any backend is initialized. Tests additionally pin
matmul precision to 'highest' so numerical-equivalence assertions are
meaningful (TPU MXU would default f32 matmuls to bf16 passes).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}")
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {len(jax.devices())}")
