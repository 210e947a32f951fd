"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax backends initialize.

This is the standard JAX trick for testing pjit/shard_map/all_gather semantics without
TPU hardware (the reference has no analogue — it validated DDP empirically on a 4-GPU
node, SURVEY.md §4).

Note: this environment's sitecustomize force-registers a remote TPU PJRT plugin and sets
JAX_PLATFORMS=axon, so the env var alone is not enough — we must override via
jax.config before any backend is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

_CACHE_DIR = "/tmp/mammo_clip_tpu_jax_cache"
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running end-to-end test (full-chain CLI drives, learning-"
        "capability runs); included in the default suite, deselect with -m 'not slow'",
    )
