"""Test config: force CPU JAX with 8 virtual devices for mesh/sharding tests.

Runs before any test module imports jax.  The axon TPU plugin ignores the
JAX_PLATFORMS env var, so the platform is pinned via jax.config instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
