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
