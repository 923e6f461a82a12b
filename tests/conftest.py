"""Test configuration: force an 8-device virtual CPU mesh for sharding tests.

This is the standard JAX multi-chip-without-a-cluster trick (SURVEY.md §4.4):
XLA_FLAGS=--xla_force_host_platform_device_count=8 with JAX_PLATFORMS=cpu.
Must run before jax is imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
