"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

The reference has no multi-device tests (SURVEY.md §4); we add them via XLA
host-platform device simulation so every sharding path is exercised in CI.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
