"""Tests for the parity-blocked smoother storage (ops.blocked).

The blocked phase must be the SAME update as the strided phase — only
the memory layout differs — so the oracle is bitwise-level agreement
with ops.smoothers on random inputs (x64), across parities, sweep
orders, and odd/even shapes.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from emg3d_tpu.ops import blocked, smoothers

pytestmark = pytest.mark.slow


def _random_setup(shape, seed=11):
    nx, ny, nz = shape
    rng = np.random.default_rng(seed)

    def cf(s):
        return jnp.asarray(rng.standard_normal(s)
                           + 1j * rng.standard_normal(s))

    ex, sx = cf((nx, ny + 1, nz + 1)), cf((nx, ny + 1, nz + 1))
    ey, sy = cf((nx + 1, ny, nz + 1)), cf((nx + 1, ny, nz + 1))
    ez, sz = cf((nx + 1, ny + 1, nz)), cf((nx + 1, ny + 1, nz))
    etas = [cf((nx, ny, nz)) for _ in range(3)]
    zeta = jnp.asarray(rng.uniform(0.5, 2.0, (nx, ny, nz)))
    hs = [jnp.asarray(rng.uniform(0.5, 2.0, n)) for n in shape]
    return (ex, ey, ez), (sx, sy, sz, *etas, zeta, *hs)


@pytest.mark.parametrize("shape", [(6, 8, 10), (7, 6, 9), (2, 2, 2)])
def test_roundtrip(shape):
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal(shape))
    out = blocked.from_blocks(blocked.to_blocks(a), a.shape)
    assert_allclose(np.asarray(out), np.asarray(a), rtol=0, atol=0)


@pytest.mark.parametrize("parity", [(0, 0, 0), (1, 1, 1), (0, 1, 0)])
def test_phase_matches_strided(parity):
    (ex, ey, ez), args = _random_setup((6, 8, 10))
    sx, sy, sz, etax, etay, etaz, zeta, hx, hy, hz = args

    ref = smoothers._gauss_seidel_phase_xla(ex, ey, ez, *args, *parity)

    fb = tuple(blocked.to_blocks(a) for a in (ex, ey, ez))
    ops = blocked.block_operands(sx, sy, sz, etax, etay, etaz, zeta)
    outb = blocked.gauss_seidel_phase_blocked(*fb, *ops, hx, hy, hz,
                                              *parity)
    for o, r, shp in zip(outb, ref, (ex.shape, ey.shape, ez.shape)):
        assert_allclose(np.asarray(blocked.from_blocks(o, shp)),
                        np.asarray(r), rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("shape", [(6, 8, 10), (7, 6, 9)])
def test_sweep_matches_strided(shape, reverse):
    (ex, ey, ez), args = _random_setup(shape)
    ref = smoothers.gauss_seidel_sweep(ex, ey, ez, *args, reverse)
    out = blocked.gauss_seidel_sweep_blocked(ex, ey, ez, *args, reverse)
    for o, r in zip(out, ref):
        assert_allclose(np.asarray(o), np.asarray(r),
                        rtol=1e-12, atol=1e-12)


def test_nu_sweeps_match_strided():
    """The nu-granularity driver (block once, 8*nu phases, unblock)
    == nu strided sweeps with alternating order."""
    (ex, ey, ez), args = _random_setup((7, 6, 9), seed=5)
    ref = smoothers.gauss_seidel(ex, ey, ez, *args, 3)
    out = blocked.gauss_seidel_blocked(ex, ey, ez, *args, 3)
    for o, r in zip(out, ref):
        assert_allclose(np.asarray(o), np.asarray(r),
                        rtol=1e-12, atol=1e-12)


def test_smoother_env_dispatch(monkeypatch):
    """EMG3D_TPU_SMOOTHER=blocked reroutes smoothers.gauss_seidel
    through the blocked layout (same numbers), and a lone
    gauss_seidel_phase call stays on the strided kernel (no pallas
    import, identical result)."""
    (ex, ey, ez), args = _random_setup((6, 8, 10), seed=7)
    ref = smoothers.gauss_seidel(ex, ey, ez, *args, 2)
    ref_phase = smoothers.gauss_seidel_phase(ex, ey, ez, *args, 0, 0, 0)
    monkeypatch.setenv("EMG3D_TPU_SMOOTHER", "blocked")
    out = smoothers.gauss_seidel(ex, ey, ez, *args, 2)
    out_phase = smoothers.gauss_seidel_phase(ex, ey, ez, *args, 0, 0, 0)
    for o, r in zip(out + out_phase, ref + ref_phase):
        assert_allclose(np.asarray(o), np.asarray(r),
                        rtol=1e-12, atol=1e-12)


def test_solver_dispatch_parity(monkeypatch):
    """A full multigrid solve with EMG3D_TPU_SMOOTHER=blocked matches
    the default strided path (same smoother, different layout)."""
    import jax

    from emg3d_tpu import fields, meshes, models, solver

    grid = meshes.TensorMesh(
        [np.ones(8) * 200.0, np.ones(8) * 250.0, np.ones(8) * 300.0],
        origin=(-800.0, -1000.0, -1200.0))
    model = models.Model(grid, property_x=1.5)
    sfield = fields.get_source_field(
        grid, source=(0, 0, 0, 0, 0), frequency=0.9)

    ref = solver.solve(model, sfield, plain=True, maxit=2, verb=-1)
    monkeypatch.setenv("EMG3D_TPU_SMOOTHER", "blocked")
    jax.clear_caches()
    try:
        out = solver.solve(model, sfield, plain=True, maxit=2, verb=-1)
    finally:
        monkeypatch.undo()
        jax.clear_caches()
    assert_allclose(np.asarray(out.field), np.asarray(ref.field),
                    rtol=1e-10, atol=1e-13)
