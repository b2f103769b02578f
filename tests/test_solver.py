"""Solver-level tests: multigrid + BiCGSTAB convergence and correctness.

Convergence-rate parity with the reference is asserted in
cycles-to-tolerance (the multicolor smoothers change the iterates, not
the physics); correctness is asserted against dense direct solves of the
(oracle-tested) operator.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import alternatives
from emg3d_tpu import fields, meshes, models, solver


def fullspace_setup(n=16, case="iso", frequency=1.0):
    grid = meshes.TensorMesh([np.ones(n) * 50.0] * 3,
                             origin=[-n * 25.0] * 3)
    kw = {"property_x": 1.0}
    if case == "vti":
        kw["property_z"] = 3.0
    if case == "tri":
        kw.update(property_y=2.0, property_z=3.0)
    model = models.Model(grid, **kw)
    sfield = fields.get_source_field(grid, (0, 0, 0, 0, 0), frequency)
    return grid, model, sfield


def test_fcycle_converges_fullspace():
    _, model, sfield = fullspace_setup(16)
    efield, info = solver.solve(model, sfield, plain=True, verb=-1,
                                return_info=True, tol=1e-6)
    assert info["exit_message"] == "CONVERGED"
    # Reference converges this class of problem in <= 10 F-cycles.
    assert info["it_mg"] <= 10
    assert info["rel_error"] < 1e-6


@pytest.mark.slow
def test_smooth_dispatch_parity(monkeypatch):
    """Whole-sweep executables == per-phase executables.

    The suite runs with EMG3D_TPU_SMOOTH_DISPATCH=phase (conftest) for
    compile speed; this pins that the fused production path performs
    the identical phase sequence.  Tolerance: XLA reassociates float
    ops across the fused phase boundaries, so agreement is to rounding
    (~1e-9 of the field scale), not bit-for-bit.
    """
    _, model, sfield = fullspace_setup(8, case="vti")

    def run():
        e, info = solver.solve(model, sfield, plain=True, verb=-1,
                               maxit=2, return_info=True)
        return np.asarray(e.field), info["rel_error"]

    monkeypatch.setenv("EMG3D_TPU_SMOOTH_DISPATCH", "phase")
    f_phase, r_phase = run()
    monkeypatch.setenv("EMG3D_TPU_SMOOTH_DISPATCH", "sweep")
    f_sweep, r_sweep = run()

    scale = np.abs(f_phase).max()
    assert_allclose(f_sweep, f_phase, rtol=1e-9, atol=1e-9 * scale)
    assert abs(r_sweep - r_phase) < 1e-6 * max(r_phase, 1e-30)


@pytest.mark.slow
def test_solution_matches_dense_solve():
    grid, model, sfield = fullspace_setup(8)
    efield = solver.solve(model, sfield, plain=True, verb=-1, tol=1e-10)

    vmodel = models.VolumeModel(model, sfield)
    A = alternatives.dense_matrix(grid, vmodel)
    mask = alternatives.interior_mask(grid)
    b = alternatives.field_to_cvec(sfield)
    e = alternatives.field_to_cvec(efield)
    x = np.zeros_like(b)
    x[mask] = np.linalg.solve(A[np.ix_(mask, mask)], b[mask])

    err = np.linalg.norm(e[mask] - x[mask]) / np.linalg.norm(x[mask])
    assert err < 1e-5


@pytest.mark.slow
def test_bicgstab_vti():
    _, model, sfield = fullspace_setup(8, case="vti")
    efield, info = solver.solve(model, sfield, verb=-1, return_info=True)
    assert info["exit_message"] == "CONVERGED"
    assert info["rel_error"] < 1e-6


@pytest.mark.slow
def test_sc_lr_stretched_grid():
    rng = np.random.default_rng(4)
    h = [50 * 1.1 ** np.arange(8), np.ones(8) * 50, 40 * (1 + rng.random(8))]
    grid = meshes.TensorMesh(h, origin=[-0.5 * np.sum(x) for x in h])
    model = models.Model(grid, property_x=1 + 9 * rng.random((8, 8, 8)))
    sfield = fields.get_source_field(grid, (0, 0, 0, 15, 40), 2.0)

    efield, info = solver.solve(
        model, sfield, sslsolver=False, semicoarsening=True,
        linerelaxation=True, verb=-1, return_info=True, maxit=30)
    assert info["exit_message"] == "CONVERGED"


@pytest.mark.slow
def test_laplace_domain():
    """Negative frequency = Laplace domain: real-valued solve."""
    _, model, sfield = fullspace_setup(8, frequency=-2.0)
    assert sfield.field.dtype == np.float64
    efield, info = solver.solve(model, sfield, plain=True, verb=-1,
                                return_info=True)
    assert info["exit_message"] == "CONVERGED"
    assert efield.field.dtype == np.float64
    assert np.isfinite(efield.field).all()


@pytest.mark.slow
@pytest.mark.parametrize("cycle", ["V", "W"])
def test_other_cycles(cycle):
    _, model, sfield = fullspace_setup(8)
    efield, info = solver.solve(model, sfield, sslsolver=False,
                                semicoarsening=False, linerelaxation=False,
                                cycle=cycle, verb=-1, return_info=True)
    assert info["exit_message"] == "CONVERGED"


@pytest.mark.slow
def test_user_clevel_caps_hierarchy():
    """A user-set clevel caps the coarsening depth (and still solves)."""
    var = solver.MGParameters(
        sslsolver=False, semicoarsening=False, linerelaxation=False,
        shape_cells=(16, 16, 16), verb=0, clevel=1)
    assert list(var.clevel) == [1, 1, 1, 1]

    # Depth really caps the built hierarchy: 2 levels instead of 4.
    _, model, sfield = fullspace_setup(16)
    vmodel = models.VolumeModel(model, sfield)
    meta, arrays = solver._build_hierarchy(vmodel, 0, 0, var.clevel[0])
    assert len(meta) == 2

    efield, info = solver.solve(model, sfield, plain=True, verb=-1,
                                clevel=1, tol=1e-6, maxit=60,
                                return_info=True)
    assert info["exit_message"] == "CONVERGED"


def test_maxit_not_converged():
    _, model, sfield = fullspace_setup(8)
    efield, info = solver.solve(model, sfield, plain=True, maxit=1,
                                verb=-1, return_info=True, tol=1e-12)
    assert "MAX. ITERATION" in info["exit_message"]
    assert info["exit"] == 1


def test_info_dict_contents():
    _, model, sfield = fullspace_setup(8)
    info = solver.solve(model, sfield, plain=True, verb=-1,
                        return_info=True, efield=fields.Field(
                            model.grid, frequency=sfield._frequency))
    for key in ["exit", "exit_message", "abs_error", "rel_error",
                "ref_error", "tol", "it_mg", "it_ssl", "time",
                "runtime_at_cycle", "error_at_cycle", "log"]:
        assert key in info
    assert len(info["error_at_cycle"]) == info["it_mg"] + 1


def test_solve_source_shortcut():
    grid, model, _ = fullspace_setup(8)
    e1, info = solver.solve_source(model, (0, 0, 0, 0, 0), 1.0, plain=True,
                                   verb=-1, return_info=True)
    sfield = fields.get_source_field(grid, (0, 0, 0, 0, 0), 1.0)
    e2 = solver.solve(model, sfield, plain=True, verb=-1)
    assert_allclose(e1.field, e2.field)


def test_dtype_mismatch_raises():
    grid, model, sfield = fullspace_setup(8)
    efield = fields.Field(grid, frequency=-1.0)  # real Laplace field
    with pytest.raises(ValueError, match="same dtype"):
        solver.solve(model, sfield, efield=efield)


def test_mgparameters_validation():
    with pytest.raises(ValueError, match="cycle"):
        solver.MGParameters(verb=0, sslsolver=False, semicoarsening=0,
                            linerelaxation=0, shape_cells=(8, 8, 8),
                            cycle="X")
    with pytest.raises(ValueError, match="sslsolver"):
        solver.MGParameters(verb=0, sslsolver="bad", semicoarsening=0,
                            linerelaxation=0, shape_cells=(8, 8, 8))
    with pytest.raises(ValueError, match="least"):
        solver.MGParameters(verb=0, sslsolver=False, semicoarsening=0,
                            linerelaxation=0, shape_cells=(8, 8, 8),
                            cycle=None)
    # Multi-digit cycling strings.
    var = solver.MGParameters(verb=0, sslsolver=False, semicoarsening=123,
                              linerelaxation=456, shape_cells=(8, 8, 8))
    assert var.sc_cycle and var.lr_cycle


@pytest.mark.parametrize("sslsolver", [
    pytest.param("cgs", marks=pytest.mark.slow), "gcrotmk"])
def test_krylov_variants(sslsolver):
    """The native device-side cgs and gcrotmk variants converge."""
    import numpy as np
    from emg3d_tpu import fields, meshes, models, solver
    grid = meshes.TensorMesh([np.ones(16) * 50.0] * 3, origin=[-400.0] * 3)
    model = models.Model(grid, property_x=1.0)
    sfield = fields.get_source_field(grid, (0, 0, 0, 0, 0), 1.0)
    efield, info = solver.solve(
        model, sfield, sslsolver=sslsolver, semicoarsening=False,
        linerelaxation=False, cycle='F', tol=1e-5, return_info=True,
        verb=0)
    assert info['exit_message'] == 'CONVERGED'
    assert info['it_ssl'] >= 1
    assert np.all(np.isfinite(efield.field))


@pytest.mark.slow
def test_whole_cycle_jit_parity(monkeypatch):
    """EMG3D_TPU_CYCLE_JIT=1 (one fused executable per cycle) matches
    the per-op dispatch path in both drivers: plain multigrid and the
    MG-preconditioned BiCGSTAB (whole-cycle preconditioner)."""
    _, model, sfield = fullspace_setup(8)

    def run(**kw):
        e, info = solver.solve(model, sfield, verb=-1, tol=1e-6,
                               return_info=True, **kw)
        return np.asarray(e.field), info

    f_mg, _ = run(plain=True)
    f_kr, _ = run(semicoarsening=False, linerelaxation=False)

    monkeypatch.setenv('EMG3D_TPU_CYCLE_JIT', '1')
    f_mg2, i_mg2 = run(plain=True)
    f_kr2, i_kr2 = run(semicoarsening=False, linerelaxation=False)

    assert i_mg2['exit_message'] == 'CONVERGED'
    assert i_kr2['exit_message'] == 'CONVERGED'
    for a, b in ((f_mg, f_mg2), (f_kr, f_kr2)):
        # XLA reassociates float ops across the fused boundaries, so
        # agreement is to solver tolerance, not bit-for-bit.
        assert np.linalg.norm(a - b) <= 1e-5 * np.linalg.norm(a)


def test_multigrid_stagnated(monkeypatch):
    """A cycle that makes no progress terminates with STAGNATED."""
    import jax.numpy as jnp
    _, model, sfield = fullspace_setup(8)

    def no_progress(meta, arrays, r, var, first):
        return tuple(jnp.zeros_like(c) for c in r)

    monkeypatch.setattr(solver, '_cycle_correction', no_progress)
    efield, info = solver.solve(model, sfield, plain=True, verb=-1,
                                return_info=True)
    assert info['exit_message'] == 'STAGNATED'
    assert np.all(efield.field == 0.0)


@pytest.mark.slow
def test_krylov_precond_abort(monkeypatch):
    """A diverging MG preconditioner aborts the outer Krylov solver
    (reference solver.py:710-728 via _ConvergenceError) and returns a
    zero field with a DIVERGED message."""
    import jax.numpy as jnp
    _, model, sfield = fullspace_setup(8)

    real = solver._cycle_correction
    calls = {'n': 0}

    def blow_up(meta, arrays, r, var, first):
        calls['n'] += 1
        de = real(meta, arrays, r, var, first)
        return tuple(1000.0 ** calls['n'] * c for c in de)

    monkeypatch.setattr(solver, '_cycle_correction', blow_up)
    efield, info = solver.solve(
        model, sfield, sslsolver=True, semicoarsening=True,
        linerelaxation=False, verb=-1, return_info=True)
    assert 'DIVERGED' in info['exit_message']
    assert 'zero' in info['exit_message']
    assert np.all(efield.field == 0.0)


def test_invalid_sslsolver():
    import numpy as np
    from emg3d_tpu import fields, meshes, models, solver
    grid = meshes.TensorMesh([np.ones(16) * 50.0] * 3, origin=[-400.0] * 3)
    model = models.Model(grid, property_x=1.0)
    sfield = fields.get_source_field(grid, (0, 0, 0, 0, 0), 1.0)
    with pytest.raises(ValueError, match="sslsolver"):
        solver.solve(model, sfield, sslsolver='nonsense', verb=0)


@pytest.mark.slow
def test_bicgstab_triaxial():
    """Triaxial anisotropy with the default MG-preconditioned BiCGSTAB
    (BASELINE config 3), validated against the dense direct solve."""
    grid, model, sfield = fullspace_setup(8, case="tri")
    efield, info = solver.solve(model, sfield, verb=-1, tol=1e-8,
                                return_info=True)
    assert info["exit_message"] == "CONVERGED"

    vmodel = models.VolumeModel(model, sfield)
    A = alternatives.dense_matrix(grid, vmodel)
    mask = alternatives.interior_mask(grid)
    b = alternatives.field_to_cvec(sfield)
    e = alternatives.field_to_cvec(efield)
    x = np.zeros_like(b)
    x[mask] = np.linalg.solve(A[np.ix_(mask, mask)], b[mask])
    err = np.linalg.norm(e[mask] - x[mask]) / np.linalg.norm(x[mask])
    assert err < 1e-5
