"""Test configuration: force CPU with 8 virtual devices (multi-chip sharding
tests run on a virtual mesh), and enable the persistent compilation cache so
repeated test runs skip XLA compiles."""

import os

import jax

# The axon TPU plugin overrides JAX_PLATFORMS env; config.update wins.
jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("BARRETENBERG_TEST_CACHE", "/root/repo/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
