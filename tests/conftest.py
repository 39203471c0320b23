"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests run on
xla_force_host_platform_device_count=8 per the project testing policy
(SURVEY.md §4). The environment pins JAX_PLATFORMS=axon via sitecustomize,
so the env var alone is not enough — jax.config.update must override it
before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# XLA compile time dominates the suite (3-20 s per first-compile test);
# a persistent cache makes re-runs hit in milliseconds, keeping the
# default tier inside its fast-iteration budget.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
