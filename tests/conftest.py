"""Test configuration: force an 8-device virtual CPU mesh for sharding tests.

This is the standard JAX multi-chip-without-a-cluster trick (SURVEY.md §4.4):
xla_force_host_platform_device_count=8 on the CPU backend. The environment
pins JAX_PLATFORMS=axon (the real TPU tunnel), which is high-latency for the
many tiny ops in unit tests — override it BEFORE any jax backend
initialization. Real-chip tests opt in via the 'tpu' marker and the
BISCUIT_TEST_TPU=1 environment variable.
"""

import os

_ON_TPU = os.environ.get("BISCUIT_TEST_TPU") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: identical step programs (tiny-model
# trainings recur across files and across suite runs) load from disk
# instead of recompiling. Complements the in-process step-fn cache in
# train/trainer.py.
import jax as _jax  # noqa: E402

_jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("BISCUIT_JAX_CACHE",
                   os.path.expanduser("~/.cache/biscuit_jax")),
)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: tests requiring the real TPU chip (BISCUIT_TEST_TPU=1)"
    )


def pytest_collection_modifyitems(config, items):
    import pytest

    if os.environ.get("BISCUIT_TEST_TPU") == "1":
        return
    skip = pytest.mark.skip(reason="real-TPU test (set BISCUIT_TEST_TPU=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
