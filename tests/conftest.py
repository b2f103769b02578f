"""Test configuration: CPU backend, 8 virtual devices, 64-bit precision.

Tests run on the CPU backend with x64 enabled so that numerics match the
reference's complex128 semantics; multi-chip sharding tests use the 8
virtual host devices (as the driver's dryrun does).

NOTE: the environment pre-imports jax via sitecustomize with
JAX_PLATFORMS=axon (real TPU tunnel), so setting the env var here is too
late — we must use jax.config.update('jax_platforms', ...), which works
as long as no backend has been initialized yet.
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the multigrid hierarchy compiles once and is
# reused across test runs (XLA CPU compiles are slow).
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
