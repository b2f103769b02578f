"""Tests for the red-black smoothers (ops.smoothers).

Key invariant: the exact solution of A e = s is a fixed point of ANY
Gauss-Seidel variant (point or line, any coloring/ordering) — each local
subsystem solve reproduces the current values when every row is already
satisfied.  This validates the smoother's system assembly against the
(oracle-tested) operator without requiring bitwise parity with the
reference's lexicographic sweeps (reference core.py:210-1348).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

import alternatives
from emg3d_tpu import fields, meshes, models
from emg3d_tpu.ops import operator, smoothers

# Compile-heavy suite (many per-shape executables on XLA:CPU):
# excluded from the quick tier, see CLAUDE.md.
pytestmark = pytest.mark.slow


def setup(shape, seed=7, case="triaxial", stretched=True):
    rng = np.random.default_rng(seed)
    if stretched:
        h = [50 * (1 + rng.random(n)) for n in shape]
    else:
        h = [np.ones(n) * 50.0 for n in shape]
    grid = meshes.TensorMesh(h, origin=[-0.5 * np.sum(hh) for hh in h])

    kwargs = {"property_x": 1 + 9 * rng.random(shape)}
    if case in ("HTI", "triaxial"):
        kwargs["property_y"] = 1 + 9 * rng.random(shape)
    if case in ("VTI", "triaxial"):
        kwargs["property_z"] = 1 + 9 * rng.random(shape)
    model = models.Model(grid, mu_r=0.5 + rng.random(shape), **kwargs)

    sfield = fields.get_source_field(grid, (0, 0, 0, 20, 30), frequency=0.9)
    vmodel = models.VolumeModel(model, sfield)
    return grid, vmodel


def exact_pair(grid, vmodel, seed=3):
    """(e_star, s) with s = A e_star; e_star random on interior edges."""
    rng = np.random.default_rng(seed)
    n = (int(np.prod(grid.shape_edges_x)) + int(np.prod(grid.shape_edges_y))
         + int(np.prod(grid.shape_edges_z)))
    v = (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    v *= alternatives.interior_mask(grid)

    nx_e = int(np.prod(grid.shape_edges_x))
    ny_e = int(np.prod(grid.shape_edges_y))
    ex = jnp.asarray(v[:nx_e].reshape(grid.shape_edges_x))
    ey = jnp.asarray(v[nx_e:nx_e + ny_e].reshape(grid.shape_edges_y))
    ez = jnp.asarray(v[nx_e + ny_e:].reshape(grid.shape_edges_z))

    P = (jnp.asarray(vmodel.eta_x), jnp.asarray(vmodel.eta_y),
         jnp.asarray(vmodel.eta_z), jnp.asarray(vmodel.zeta),
         jnp.asarray(grid.h[0]), jnp.asarray(grid.h[1]),
         jnp.asarray(grid.h[2]))
    s = operator.amat_x(ex, ey, ez, *P)
    return (ex, ey, ez), s, P


@pytest.mark.parametrize("case", ["isotropic", "triaxial"])
@pytest.mark.parametrize("shape", [(4, 5, 6), (2, 3, 4)])
def test_point_smoother_fixed_point(shape, case):
    grid, vm = setup(shape, case=case)
    e, s, P = exact_pair(grid, vm)

    out = smoothers.gauss_seidel(*e, *s, *P, 2)
    for o, i in zip(out, e):
        assert_allclose(np.asarray(o), np.asarray(i), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("axis", [0, 1, 2])
@pytest.mark.parametrize("shape", [(4, 5, 6)])
def test_line_smoother_fixed_point(shape, axis):
    grid, vm = setup(shape, case="triaxial")
    e, s, P = exact_pair(grid, vm)

    out = smoothers.gauss_seidel_line(*e, *s, *P, 2, axis)
    for o, i in zip(out, e):
        assert_allclose(np.asarray(o), np.asarray(i), rtol=1e-10, atol=1e-12)


def _resnorm(e, s, P):
    r = operator.residual(*s, *e, *P)
    return float(operator.residual_norm(*r))


@pytest.mark.parametrize("smoother", ["point", "line0", "line1", "line2"])
def test_smoother_reduces_residual(smoother):
    grid, vm = setup((8, 8, 8), case="triaxial", stretched=True)
    _, s, P = exact_pair(grid, vm, seed=5)

    e0 = tuple(jnp.zeros_like(c) for c in s)
    r0 = _resnorm(e0, s, P)

    if smoother == "point":
        e1 = smoothers.gauss_seidel(*e0, *s, *P, 2)
    else:
        e1 = smoothers.gauss_seidel_line(*e0, *s, *P, 2,
                                         int(smoother[-1]))
    r1 = _resnorm(e1, s, P)
    assert r1 < 0.6 * r0

    # More sweeps keep reducing.
    if smoother == "point":
        e2 = smoothers.gauss_seidel(*e1, *s, *P, 4)
    else:
        e2 = smoothers.gauss_seidel_line(*e1, *s, *P, 4,
                                         int(smoother[-1]))
    r2 = _resnorm(e2, s, P)
    assert r2 < 0.7 * r1


def test_point_smoother_single_interior_node_is_exact():
    """On a 2x2x2 grid there is one interior node: GS == direct solve of
    the 6-edge subsystem, so one sweep must satisfy those 6 rows."""
    grid, vm = setup((2, 2, 2), case="isotropic")
    _, s, P = exact_pair(grid, vm, seed=13)

    e0 = tuple(jnp.zeros_like(c) for c in s)
    e1 = smoothers.gauss_seidel(*e0, *s, *P, 1)
    r = operator.residual(*s, *e1, *P)

    # The six interior-edge rows must be (near) zero.
    rx, ry, rz = (np.asarray(c) for c in r)
    assert abs(rx[0, 1, 1]) < 1e-10 and abs(rx[1, 1, 1]) < 1e-10
    assert abs(ry[1, 0, 1]) < 1e-10 and abs(ry[1, 1, 1]) < 1e-10
    assert abs(rz[1, 1, 0]) < 1e-10 and abs(rz[1, 1, 1]) < 1e-10


class TestBlockPCR:
    """Parallel cyclic reduction == block-Thomas on the line systems."""

    def _random_system(self, n, seed=7):
        rng = np.random.default_rng(seed)
        mid = (rng.normal(size=(n, 4, 3, 5, 5))
               + 1j * rng.normal(size=(n, 4, 3, 5, 5)))
        mid = mid + np.swapaxes(mid, -1, -2) + 12.0 * np.eye(5)
        left = 0.5 * (rng.normal(size=(n, 4, 3, 5, 5))
                      + 1j * rng.normal(size=(n, 4, 3, 5, 5)))
        left[0] = 0
        rhs = (rng.normal(size=(n, 4, 3, 5))
               + 1j * rng.normal(size=(n, 4, 3, 5)))
        return (jnp.asarray(mid), jnp.asarray(left), jnp.asarray(rhs))

    @pytest.mark.parametrize("n", [2, 3, 8, 16, 33])
    def test_pcr_vs_thomas_random(self, n):
        mid, left, rhs = self._random_system(n)
        ut = smoothers._block_thomas(mid, left, rhs)
        up = smoothers._block_pcr(mid, left, rhs)
        assert_allclose(np.asarray(up), np.asarray(ut), rtol=1e-12)

    def test_pcr_single_row(self):
        mid, left, rhs = self._random_system(1)
        up = smoothers._block_pcr(mid, left, rhs)
        ref = smoothers._solve5(mid, rhs[..., None])[..., 0]
        assert_allclose(np.asarray(up), np.asarray(ref), rtol=1e-12)

    def test_line_phase_with_pcr(self, monkeypatch):
        """A real line-relaxation phase gives identical fields with PCR."""
        rng = np.random.default_rng(11)
        nx, ny, nz = 9, 8, 7
        hx = jnp.asarray(rng.uniform(20, 60, nx))
        hy = jnp.asarray(rng.uniform(20, 60, ny))
        hz = jnp.asarray(rng.uniform(20, 60, nz))
        shp_x, shp_y, shp_z = (nx, ny+1, nz+1), (nx+1, ny, nz+1), (nx+1, ny+1, nz)
        f = lambda s: jnp.asarray(rng.normal(size=s) + 1j*rng.normal(size=s))
        e = (f(shp_x), f(shp_y), f(shp_z))
        s = (f(shp_x), f(shp_y), f(shp_z))
        eta = tuple(jnp.asarray(-(rng.uniform(1e3, 5e3, (nx, ny, nz)))
                    + 1j*rng.uniform(1e2, 5e2, (nx, ny, nz))) for _ in range(3))
        zeta = jnp.asarray(rng.uniform(1e3, 2e3, (nx, ny, nz)))

        monkeypatch.setenv("EMG3D_TPU_LINE_SOLVER", "thomas")
        out_t = smoothers._line_relax_x_phase(
            *e, *s, *eta, zeta, hx, hy, hz, 0, 0)
        monkeypatch.setenv("EMG3D_TPU_LINE_SOLVER", "pcr")
        out_p = smoothers._line_relax_x_phase(
            *e, *s, *eta, zeta, hx, hy, hz, 0, 0)
        for a, b in zip(out_t, out_p):
            assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-11)
