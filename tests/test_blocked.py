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


@pytest.mark.parametrize("shape,parity", [
    ((6, 8, 10), (0, 0)), ((6, 8, 10), (1, 1)), ((7, 9, 6), (0, 1)),
    ((2, 6, 6), (1, 0)), ((3, 6, 7), (0, 0)),
])
def test_line_x_phase_matches_strided(shape, parity):
    """Blocked x-line phase == strided x-line phase (same elimination
    order, different layout), incl. odd nx (clamp crossing) and nx=2."""
    (ex, ey, ez), args = _random_setup(shape, seed=13)
    sx, sy, sz, etax, etay, etaz, zeta, hx, hy, hz = args

    ref = smoothers._line_relax_x_phase(ex, ey, ez, *args, *parity)

    fb = tuple(blocked.to_blocks(a) for a in (ex, ey, ez))
    sb = tuple(blocked.to_blocks(a) for a in (sx, sy, sz))
    ops = blocked.block_model_operands(etax, etay, etaz, zeta)
    outb = blocked._line_relax_x_phase_blocked(
        *fb, *sb, *ops, hx, hy, hz, *parity)
    for o, r, shp in zip(outb, ref, (ex.shape, ey.shape, ez.shape)):
        assert_allclose(np.asarray(blocked.from_blocks(o, shp)),
                        np.asarray(r), rtol=1e-10, atol=1e-11)


@pytest.mark.parametrize("axis", [0, 1, 2])
@pytest.mark.parametrize("parity", [(0, 0), (1, 1), (0, 1)])
def test_line_phase_axes_match_strided(axis, parity):
    """The y-/z-frames (blocked transpose permutation) match the
    strided permuted-frame kernels for every axis."""
    (ex, ey, ez), args = _random_setup((6, 7, 8), seed=17)
    sx, sy, sz, etax, etay, etaz, zeta, hx, hy, hz = args

    ref = smoothers.gauss_seidel_line_phase(ex, ey, ez, *args,
                                            *parity, axis)

    fb = tuple(blocked.to_blocks(a) for a in (ex, ey, ez))
    sb = tuple(blocked.to_blocks(a) for a in (sx, sy, sz))
    ops = blocked.block_model_operands(etax, etay, etaz, zeta)
    outb = blocked.line_relax_phase_blocked(
        *fb, *sb, *ops, hx, hy, hz, *parity, axis)
    for o, r, shp in zip(outb, ref, (ex.shape, ey.shape, ez.shape)):
        assert_allclose(np.asarray(blocked.from_blocks(o, shp)),
                        np.asarray(r), rtol=1e-10, atol=1e-11)


def test_line_x_phase_pcr_matches(monkeypatch):
    """The PCR dispatch of the blocked line phase (interleaved lanes)
    agrees with the paired-Thomas dispatch."""
    (ex, ey, ez), args = _random_setup((6, 8, 10), seed=19)
    sx, sy, sz, etax, etay, etaz, zeta, hx, hy, hz = args
    fb = tuple(blocked.to_blocks(a) for a in (ex, ey, ez))
    sb = tuple(blocked.to_blocks(a) for a in (sx, sy, sz))
    ops = blocked.block_model_operands(etax, etay, etaz, zeta)

    ref = blocked._line_relax_x_phase_blocked(
        *fb, *sb, *ops, hx, hy, hz, 0, 1)
    monkeypatch.setenv("EMG3D_TPU_LINE_SOLVER", "pcr")
    out = blocked._line_relax_x_phase_blocked(
        *fb, *sb, *ops, hx, hy, hz, 0, 1)
    for o, r in zip(out, ref):
        for ob, rb in zip(o, r):
            assert_allclose(np.asarray(ob), np.asarray(rb),
                            rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("c_lr_dir", [0, 1, 2, 3, 4, 7])
def test_smooth_blocked_dev_matches_strided(c_lr_dir, monkeypatch):
    """The whole-smoothing-call blocked driver (fields blocked once,
    point + line sweeps, alternating orders) == the strided smoother
    composition solver._smooth_dev dispatches to."""
    monkeypatch.setenv("EMG3D_TPU_SMOOTHER", "xla")
    (ex, ey, ez), args = _random_setup((6, 8, 7), seed=23)
    sx, sy, sz, etax, etay, etaz, zeta, hx, hy, hz = args
    nu = 2

    e = (ex, ey, ez)
    if c_lr_dir == 0:
        e = smoothers.gauss_seidel(*e, *args, nu)
    for axis, dirs in ((0, (1, 5, 6, 7)), (1, (2, 4, 6, 7)),
                       (2, (3, 4, 5, 7))):
        if c_lr_dir in dirs:
            e = smoothers.gauss_seidel_line(*e, *args, nu, axis)

    ops = blocked.block_model_operands(etax, etay, etaz, zeta)
    out = blocked.smooth_blocked_dev(
        (ex, ey, ez), (sx, sy, sz), ops, hx, hy, hz, c_lr_dir, nu)
    for o, r in zip(out, e):
        assert_allclose(np.asarray(o), np.asarray(r),
                        rtol=1e-10, atol=1e-11)


def test_solver_production_blocked_parity(monkeypatch):
    """End-to-end production config (BiCGSTAB + semicoarsening + line
    relaxation) under sweep dispatch: the blocked path (pre-blocked
    hierarchy operands + smooth_blocked_dev) matches the strided path."""
    import jax

    from emg3d_tpu import fields, meshes, models, solver

    grid = meshes.TensorMesh(
        [np.ones(8) * 200.0, np.ones(8) * 250.0, np.ones(8) * 300.0],
        origin=(-800.0, -1000.0, -1200.0))
    rng = np.random.default_rng(31)
    model = models.Model(
        grid, property_x=10 ** rng.uniform(-1, 1, grid.shape_cells))
    sfield = fields.get_source_field(
        grid, source=(0, 0, 0, 0, 0), frequency=0.9)
    kw = dict(sslsolver=True, semicoarsening=True, linerelaxation=True,
              maxit=2, verb=-1)

    monkeypatch.setenv("EMG3D_TPU_SMOOTH_DISPATCH", "sweep")
    monkeypatch.setenv("EMG3D_TPU_SMOOTHER", "xla")
    jax.clear_caches()
    try:
        ref = solver.solve(model, sfield, **kw)
        monkeypatch.setenv("EMG3D_TPU_SMOOTHER", "blocked")
        jax.clear_caches()
        out = solver.solve(model, sfield, **kw)
    finally:
        monkeypatch.undo()
        jax.clear_caches()
    num = np.linalg.norm(np.asarray(out.field) - np.asarray(ref.field))
    den = np.linalg.norm(np.asarray(ref.field))
    assert num / den < 1e-9


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


@pytest.mark.parametrize("lr", [4, 7])
def test_pretransposed_model_frames(lr):
    """smooth_blocked_dev with pre-transposed model frames ('blk_t',
    stored once per hierarchy level) matches the on-the-fly frame
    transposes exactly."""
    (ex, ey, ez), args = _random_setup((6, 8, 10), seed=23)
    sx, sy, sz, etax, etay, etaz, zeta, hx, hy, hz = args
    ops = blocked.block_model_operands(etax, etay, etaz, zeta)
    ops_t = blocked.transposed_model_frames(ops)

    ref = blocked.smooth_blocked_dev(
        (ex, ey, ez), (sx, sy, sz), ops, hx, hy, hz, lr, 2)
    out = blocked.smooth_blocked_dev(
        (ex, ey, ez), (sx, sy, sz), ops, hx, hy, hz, lr, 2,
        ops_t=ops_t)
    for o, r in zip(out, ref):
        assert_allclose(np.asarray(o), np.asarray(r), rtol=0, atol=0)
