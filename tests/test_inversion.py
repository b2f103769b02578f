"""Native inversion driver (emg3d_tpu.inversion.native).

A tiny synthetic inversion: recover a conductive anomaly in a
homogeneous background from noisy-free point-dipole data. The test
asserts real misfit reduction and that the update concentrates at the
anomaly — an end-to-end check of the adjoint-state gradient feeding an
optimizer.
"""

import numpy as np
import pytest

import emg3d_tpu as emg3d
from emg3d_tpu.inversion import native


@pytest.mark.slow
def test_lbfgs_recovers_anomaly():
    grid = emg3d.TensorMesh([np.full(16, 150.0)] * 3, origin=(-1200,) * 3)

    # True model: 10x conductive block in 1 Ohm.m background (log10).
    lgres = np.zeros(grid.shape_cells)
    lgres[6:10, 6:10, 6:10] = -1.0
    model_true = emg3d.Model(grid, property_x=lgres,
                             mapping='LgResistivity')

    survey = emg3d.Survey(
        sources=[emg3d.electrodes.TxElectricPoint((x, 0, 600, 0, 0))
                 for x in (-450.0, 450.0)],
        receivers=[emg3d.electrodes.RxElectricPoint((x, y, -600, 0, 0))
                   for x in (-600.0, 0.0, 600.0)
                   for y in (-300.0, 300.0)],
        frequencies=1.0,
        noise_floor=1e-17, relative_error=0.01)

    sim_true = emg3d.Simulation(
        survey=survey, model=model_true, gridding='same', verb=-1,
        receiver_interpolation='linear')
    sim_true.compute(observed=True)     # noise-free observed data

    # Start from the homogeneous background.
    model0 = emg3d.Model(grid, property_x=np.zeros(grid.shape_cells),
                         mapping='LgResistivity')
    sim = emg3d.Simulation(
        survey=survey, model=model0, gridding='same', verb=-1,
        receiver_interpolation='linear')

    result = native.minimize(sim, maxiter=6, verb=0,
                             bounds=(-2.0, 1.0))

    assert result.misfit0 > 0
    assert result.misfit < 0.35 * result.misfit0   # real progress
    assert result.n_iterations >= 2
    assert result.model is sim.model

    # The recovered update must be conductive and concentrated at the
    # anomaly: mean update inside the block clearly exceeds outside.
    dm = np.asarray(result.model.property_x) - 0.0
    inside = dm[6:10, 6:10, 6:10].mean()
    outside = (dm.sum() - dm[6:10, 6:10, 6:10].sum()) / (dm.size - 64)
    assert inside < -0.05                  # conductive (negative lg)
    assert inside < outside - 0.03         # concentrated at the block


@pytest.mark.slow
def test_objective_gradient_ordering():
    """FD directional derivative on an asymmetric, non-cubic model.

    Pins the parameter-vector convention of the native driver: the
    gradient returned by the objective must live in the SAME (F-order)
    flattening as the parameter vector.  A C/F mix-up permutes the
    gradient; with a non-cubic grid and an asymmetric start model the
    directional-derivative check then fails by construction.
    """
    rng = np.random.default_rng(11)
    grid = emg3d.TensorMesh(
        [np.full(16, 150.0), np.full(8, 300.0), np.full(12, 200.0)],
        origin=(-1200.0, -1200.0, -1200.0))

    # Observed data from a conductive block (asymmetric position).
    lg_true = np.zeros(grid.shape_cells)
    lg_true[2:8, 1:4, 6:10] = -0.7
    survey = emg3d.Survey(
        sources=emg3d.electrodes.TxElectricPoint((-300, 0, 700, 0, 0)),
        receivers=[emg3d.electrodes.RxElectricPoint((x, y, -700, 0, 0))
                   for x in (-600.0, 300.0) for y in (-300.0, 450.0)],
        frequencies=1.0, noise_floor=1e-17, relative_error=0.01)
    sim_true = emg3d.Simulation(
        survey=survey, gridding='same', verb=-1,
        receiver_interpolation='linear',
        model=emg3d.Model(grid, lg_true, mapping='LgResistivity'))
    sim_true.compute(observed=True)

    # Start model: smooth but transpose-ASYMMETRIC (gradient over it is
    # not permutation-invariant).
    lg0 = 0.1 * rng.standard_normal(grid.shape_cells)
    sim = emg3d.Simulation(
        survey=survey, gridding='same', verb=-1,
        receiver_interpolation='linear',
        model=emg3d.Model(grid, lg0, mapping='LgResistivity'))

    fun, set_model, m0 = native._make_objective(sim)
    np.testing.assert_allclose(
        m0, lg0.ravel(order='F'))          # convention itself

    phi0, grad = fun(m0)
    assert phi0 > 0 and np.linalg.norm(grad) > 0
    d = rng.standard_normal(m0.size)
    d /= np.linalg.norm(d)
    eps = 1e-3

    def misfit_only(m):                    # forward pass, no adjoint
        set_model(m)
        return float(sim.misfit)

    fd = (misfit_only(m0 + eps * d) - misfit_only(m0 - eps * d)) / (2 * eps)
    assert abs(fd - grad @ d) < 0.02 * abs(fd)


@pytest.mark.slow
def test_vti_objective_gradient():
    """VTI: the parameter vector holds two blocks (x then z); the FD
    directional derivative pins both the block order and the F-order
    flattening within each block."""
    rng = np.random.default_rng(7)
    grid = emg3d.TensorMesh(
        [np.full(12, 200.0), np.full(8, 300.0), np.full(10, 250.0)],
        origin=(-1200.0, -1200.0, -1250.0))
    sopts = {'plain': True, 'tol': 5e-7, 'verb': 0}

    lg_true = np.zeros(grid.shape_cells)
    lg_true[2:6, 1:4, 4:8] = -0.6
    survey = emg3d.Survey(
        sources=emg3d.electrodes.TxElectricPoint((-300, 0, 800, 0, 0)),
        receivers=[emg3d.electrodes.RxElectricPoint((x, y, -800, 0, 0))
                   for x in (-500.0, 400.0) for y in (-300.0, 300.0)],
        frequencies=1.0, noise_floor=1e-17, relative_error=0.01)
    sim_true = emg3d.Simulation(
        survey=survey, gridding='same', verb=-1,
        receiver_interpolation='linear', solver_opts=sopts,
        model=emg3d.Model(grid, lg_true, property_z=lg_true + 0.2,
                          mapping='LgResistivity'))
    sim_true.compute(observed=True)

    lg0x = 0.1 * rng.standard_normal(grid.shape_cells)
    lg0z = 0.1 * rng.standard_normal(grid.shape_cells)
    sim = emg3d.Simulation(
        survey=survey, gridding='same', verb=-1,
        receiver_interpolation='linear', solver_opts=sopts,
        model=emg3d.Model(grid, lg0x, property_z=lg0z,
                          mapping='LgResistivity'))

    fun, set_model, m0 = native._make_objective(sim)
    assert m0.size == 2 * grid.n_cells
    np.testing.assert_allclose(m0[:grid.n_cells], lg0x.ravel(order='F'))
    np.testing.assert_allclose(m0[grid.n_cells:], lg0z.ravel(order='F'))

    phi0, grad = fun(m0)
    assert phi0 > 0 and np.linalg.norm(grad) > 0
    d = rng.standard_normal(m0.size)
    d /= np.linalg.norm(d)
    eps = 1e-3

    def misfit_only(m):
        set_model(m)
        return float(sim.misfit)

    fd = (misfit_only(m0 + eps * d) - misfit_only(m0 - eps * d)) / (2 * eps)
    assert abs(fd - grad @ d) < 0.02 * abs(fd)


def test_result_repr():
    r = native.InversionResult(
        model=None, misfit=1.0, misfit0=10.0, n_iterations=3,
        n_evaluations=5, success=True, message='ok')
    assert 'iterations=3' in repr(r)


def test_roughness_functional():
    """Pure-numpy checks of the smoothness penalty ½β‖D m‖²."""
    rng = np.random.default_rng(7)
    shape = (5, 4, 3)
    widths = [rng.uniform(50, 200, n) for n in shape]
    rough = native._make_roughness(shape, widths)

    # Constant model -> zero penalty, zero gradient.
    phi, g = rough(np.full(shape, 3.14), (1.0, 1.0, 1.0))
    assert phi == 0.0
    np.testing.assert_allclose(g, 0.0)

    # FD check of the gradient on a random model, anisotropic weights.
    m = rng.standard_normal(shape)
    axw = (1.0, 2.5, 0.0)          # z-axis off: per-axis weighting
    phi, g = rough(m, axw)
    assert phi > 0

    # z-variations must not contribute when its weight is 0.
    mz = m + rng.standard_normal((1, 1, shape[2]))
    phi_z, _ = rough(mz, axw)
    # Only x/y diffs matter; adding a pure-z profile changes nothing.
    assert abs(phi_z - phi) < 1e-12 * max(phi, 1.0)

    d = rng.standard_normal(shape)
    eps = 1e-6
    fd = (rough(m + eps * d, axw)[0] - rough(m - eps * d, axw)[0]) / (2 * eps)
    assert abs(fd - (g * d).sum()) < 1e-7 * abs(fd)

    # Linear-in-x model on a uniform grid: penalty ≈ slope² * n_diffs/dx².
    # (Discrete ∫|∇m|² analogue: scale-invariance under refinement of
    # the *scaled* functional is what the inverse-distance weight buys.)
    wx = np.full(6, 100.0)
    r2 = native._make_roughness((6, 2, 2), [wx, np.ones(2), np.ones(2)])
    mlin = np.arange(6.0)[:, None, None] * np.ones((1, 2, 2))
    phi_lin, _ = r2(mlin, (1.0, 0.0, 0.0))
    # each of the 5*2*2 diffs contributes ½(1/100)² -> 20 * 0.5e-4
    np.testing.assert_allclose(phi_lin, 20 * 0.5 * (1 / 100.0) ** 2)


class _QuadSim:
    """Stub Simulation: quadratic misfit ½‖m − m*‖² in mapping space.

    Exercises minimize()'s plumbing (blocks, F-order, clean/recompute
    cycle, smoothness wiring) without any PDE solve.
    """

    def __init__(self, grid, m_target):
        self._target = m_target
        self.model = emg3d.Model(
            grid, property_x=np.zeros(grid.shape_cells),
            mapping='LgResistivity')

    def clean(self, what):
        assert what == 'computed'

    @property
    def misfit(self):
        d = np.asarray(self.model.property_x) - self._target
        return 0.5 * float((d * d).sum())

    @property
    def gradient(self):
        return np.asarray(self.model.property_x) - self._target


def test_minimize_smoothness_wiring():
    grid = emg3d.TensorMesh([np.full(6, 100.0)] * 3, origin=(0, 0, 0))
    rng = np.random.default_rng(3)
    target = rng.standard_normal(grid.shape_cells)

    res0 = native.minimize(_QuadSim(grid, target), maxiter=60,
                           method='L-BFGS-B', verb=0, tol=1e-12)
    m_plain = np.asarray(res0.model.property_x)
    np.testing.assert_allclose(m_plain, target, atol=1e-4)

    # Strong smoothness pulls the minimizer away from the rough target
    # and the recovered model must be smoother than the unregularized
    # one (smaller first-difference energy).
    res1 = native.minimize(_QuadSim(grid, target), maxiter=60,
                           method='L-BFGS-B', verb=0, tol=1e-12,
                           smoothness=1e5)
    m_smooth = np.asarray(res1.model.property_x)

    def d2(m):
        return sum(float((np.diff(m, axis=a) ** 2).sum()) for a in range(3))

    assert d2(m_smooth) < 0.2 * d2(m_plain)
    assert res1.misfit > res0.misfit       # trades data fit for smoothness

    # Per-axis tuple accepted: z-only smoothing leaves x/y roughness.
    res2 = native.minimize(_QuadSim(grid, target), maxiter=60,
                           method='L-BFGS-B', verb=0, tol=1e-12,
                           smoothness=(0.0, 0.0, 1e5))
    m_z = np.asarray(res2.model.property_x)
    dz = float((np.diff(m_z, axis=2) ** 2).sum())
    dx = float((np.diff(m_z, axis=0) ** 2).sum())
    assert dz < 0.05 * dx
