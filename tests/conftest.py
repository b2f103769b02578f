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

# Per-phase smoother executables compile much faster than the fused
# whole-sweep ones (the production default) — the right trade-off for a
# compile-dominated test suite on XLA:CPU.  The sweep path's parity is
# covered explicitly by test_solver.py::test_smooth_dispatch_parity.
os.environ.setdefault("EMG3D_TPU_SMOOTH_DISPATCH", "phase")

import pytest  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# XLA:CPU JIT'd executables consume memory mappings; a full single-
# process suite run exceeds vm.max_map_count (65530) and LLVM then
# SEGFAULTS inside backend_compile_and_load.  Drop the executable caches
# whenever the process approaches the limit (costs re-compiles in later
# modules, but keeps the process alive).
_MAPS_LIMIT = 30000  # each big smoother executable ≈ 1400 maps


def _n_maps():
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


@pytest.fixture(autouse=True)
def _jit_map_guard():
    yield
    if _n_maps() > _MAPS_LIMIT:
        jax.clear_caches()

# NOTE: do NOT enable the persistent compilation cache here.  jax 0.9 /
# XLA:CPU segfaults intermittently when (de)serializing executables
# (observed in both compilation_cache.put_executable_and_time and
# get_executable_and_time), killing the whole pytest process.  Tests run
# with pytest-xdist workers instead (pyproject addopts) so compiles are
# spread across processes.
