"""Tests for Simulation: forward, misfit, adjoint gradient, jvec/jtvec.

Mirrors the reference test strategy (tests/test_simulations.py): the
adjoint-state gradient is validated against a brute-force finite
difference, and jvec/jtvec by the adjoint (dot-product) identity —
natively, without discretize.
"""

import numpy as np
import pytest

import emg3d_tpu as e3
from emg3d_tpu import electrodes, maps, meshes, surveys

import alternatives


def dot_test(fwd, adj, shape_model, shape_data, rng, rtol=1e-4):
    """<w, Re(J v)> == <v, Jᵀ w> (discretize.tests.assert_isadjoint)."""
    v = rng.standard_normal(shape_model)
    w = rng.standard_normal(shape_data)
    lhs = np.sum(w * fwd(v).real)
    rhs = np.sum(v * adj(w))
    assert abs(lhs - rhs) <= rtol * (abs(lhs) + abs(rhs)) / 2


def make_inputs(nx=16, rec_comp=(0, 0), mapping='Resistivity',
                anisotropy='isotropic', nsrc=1, nfreq=1):
    """Small fullspace survey + model for simulation tests."""
    h = np.ones(nx) * 100.0
    grid = meshes.TensorMesh([h, h, h], origin=(-nx * 50.,) * 3)

    pmap = getattr(maps, 'Map' + mapping)()
    con = 1.0  # S/m
    inp = {'grid': grid, 'mapping': mapping,
           'property_x': pmap.forward(con)}
    if anisotropy in ('HTI', 'triaxial'):
        inp['property_y'] = pmap.forward(1.1 * con)
    if anisotropy in ('VTI', 'triaxial'):
        inp['property_z'] = pmap.forward(1.4 * con)
    model = e3.Model(**inp)

    src_x = [0.] if nsrc == 1 else list(np.linspace(-100., 100., nsrc))
    sources = [electrodes.TxElectricDipole((x, 0., 0., 0., 0.))
               for x in src_x]
    receivers = [
        electrodes.RxElectricPoint((x, 50., 0., *rec_comp))
        for x in [250., 350.]
        # z-offset keeps Hy of the x-dipole well away from its symmetry
        # zero (on-axis Hy = 0 would blow up the 1/|d|² weights).
    ] + [electrodes.RxMagneticPoint((300., 0., 100., 90., 0.))]
    frequencies = [1.0, 2.0][:nfreq]

    survey = surveys.Survey(sources, receivers, frequencies,
                            relative_error=0.05, noise_floor=1e-17)

    sim_inp = {
        'survey': survey, 'gridding': 'same',
        'receiver_interpolation': 'linear', 'tqdm_opts': False,
        'solver_opts': {'plain': True, 'tol': 5e-7, 'verb': 0},
    }
    return model, sim_inp


@pytest.fixture(scope='module')
def computed_sim():
    """One computed simulation shared by read-only tests."""
    model, sim_inp = make_inputs()
    sim = e3.Simulation(model=model, **sim_inp)
    sim.compute(observed=True, add_noise=False)
    return model, sim_inp, sim


class TestForward:

    def test_synthetic_finite(self, computed_sim):
        model, sim_inp, sim = computed_sim
        syn = np.asarray(sim.data.synthetic)
        assert np.all(np.isfinite(syn))

    @pytest.mark.slow
    def test_responses_vs_analytical(self):
        """Electric receivers vs analytical fullspace.

        Config follows the reference cross-check (test_fields.py:408-438):
        10 Hz in 0.3 Ωm (skin depth ≈ 87 m) so the PEC boundaries of a
        48³ × 20 m grid sit ≥ 5 skin depths out; 10 % tolerance.
        """
        h = np.ones(48) * 20.0
        grid = meshes.TensorMesh([h, h, h], origin=(-480., -480., -480.))
        model = e3.Model(grid, property_x=0.3, mapping='Resistivity')
        src = electrodes.TxElectricDipole((0., 0., 0., 0., 0.))
        rec_x = [150., 200., 250.]
        receivers = [electrodes.RxElectricPoint((x, 45., 0., 0., 0.))
                     for x in rec_x]
        survey = surveys.Survey([src], receivers, [10.0],
                                relative_error=0.01)
        sim = e3.Simulation(
            survey=survey, model=model, gridding='same', tqdm_opts=False,
            receiver_interpolation='cubic',
            solver_opts={'plain': True, 'tol': 1e-6, 'verb': 0})
        sim.compute()

        pts = np.array([[x, 45., 0.] for x in rec_x])
        exact = alternatives.fullspace_dipole(
            pts, src=(0., 0., 0.), frequency=10.0, resistivity=0.3)
        syn = np.asarray(sim.data.synthetic)
        np.testing.assert_allclose(syn[0, :, 0], exact[:, 0], rtol=0.1)

    def test_fields_accessors(self, computed_sim):
        model, sim_inp, sim = computed_sim
        ef = sim.get_efield('TxED-1', 'f-1')
        assert ef.grid.shape_cells == (16, 16, 16)
        hf = sim.get_hfield('TxED-1', 1.0)
        assert hf.field.size == np.sum(
            [np.prod(s) for s in (ef.grid.shape_faces_x,
                                  ef.grid.shape_faces_y,
                                  ef.grid.shape_faces_z)])
        info = sim.get_efield_info('TxED-1', 'f-1')
        assert info['exit'] == 0

    def test_repr_and_info(self, computed_sim):
        model, sim_inp, sim = computed_sim
        assert 'Simulation' in repr(sim)
        out = sim.print_grid_info(return_info=True)
        assert '16' in out
        out = sim.print_solver_info('efield', verb=1, return_info=True)
        assert 'CONVERGED' in out


class TestMisfitGradient:

    def test_misfit_zero_for_perfect_data(self, computed_sim):
        model, sim_inp, sim = computed_sim
        # observed == synthetic (no noise added).
        assert sim.misfit < 1e-28

    def test_misfit_requires_std(self):
        model, sim_inp = make_inputs()
        sim_inp = dict(sim_inp)
        sim_inp['survey'] = surveys.Survey(
            list(sim_inp['survey'].sources.values()),
            list(sim_inp['survey'].receivers.values()),
            [1.0], data=np.ones((1, 3, 1)))
        sim = e3.Simulation(model=model, **sim_inp)
        with pytest.raises(ValueError, match='standard_deviation'):
            _ = sim.misfit

    def test_as_vs_fd_gradient(self):
        """Adjoint-state vs finite-difference gradient (NRMSD < 1.5 %)."""
        model, sim_inp = make_inputs()

        # Observed data from a slightly different (true) model.
        model_true = e3.Model(model.grid, property_x=1.2,
                              mapping='Resistivity')
        sim_true = e3.Simulation(model=model_true, **sim_inp)
        sim_true.compute(observed=True, add_noise=False)
        observed = np.asarray(sim_true.data.observed).copy()

        sim_inp = dict(sim_inp)
        sim_inp['survey'] = sim_inp['survey'].copy()
        sim_inp['survey'].data['observed'] = observed

        sim = e3.Simulation(model=model, **sim_inp)
        data_misfit = sim.misfit
        grad = sim.gradient
        assert grad.shape == (16, 16, 16)

        # A cell with significant gradient, away from source/boundary.
        cgrad = grad / (-1.0 ** 2)  # Resistivity chain undone (con=1).
        cgrad = cgrad.copy()
        cgrad[6:10, 6:10, 6:10] = 0.0  # Exclude source region.
        ix, iy, iz = np.unravel_index(np.argmax(abs(cgrad)), cgrad.shape)

        # Forward finite difference.
        epsilon = 1e-4
        model_diff = model.copy()
        model_diff.property_x[ix, iy, iz] += epsilon
        sim_fd = e3.Simulation(model=model_diff, **sim_inp)
        fdgrad = float((sim_fd.misfit - data_misfit) / epsilon)

        nrmsd = 200 * abs(grad[ix, iy, iz] - fdgrad)
        nrmsd /= abs(grad[ix, iy, iz]) + abs(fdgrad)
        assert nrmsd < 1.5


class TestAdjoint:

    @pytest.mark.parametrize("anisotropy,mapping,vshape", [
        ('isotropic', 'Resistivity', ()),
        ('HTI', 'LnConductivity', (2,)),
        ('VTI', 'LgResistivity', (2,)),
        ('triaxial', 'Conductivity', (3,)),
    ])
    def test_jvec_jtvec_adjoint(self, anisotropy, mapping, vshape):
        model, sim_inp = make_inputs(mapping=mapping, anisotropy=anisotropy)
        sim = e3.Simulation(model=model, **sim_inp)
        sim.compute(observed=True, add_noise=False)

        rng = np.random.default_rng(11)
        dot_test(sim.jvec, sim.jtvec,
                 (*vshape, *model.grid.shape_cells),
                 sim.survey.shape, rng)

    def test_jtvec_equals_gradient(self):
        """jtvec(residual·weights) reproduces the gradient."""
        model, sim_inp = make_inputs()
        model_true = e3.Model(model.grid, property_x=1.3)
        sim_true = e3.Simulation(model=model_true, **sim_inp)
        sim_true.compute(observed=True, add_noise=False)
        observed = np.asarray(sim_true.data.observed).copy()

        sim_inp = dict(sim_inp)
        sim_inp['survey'] = sim_inp['survey'].copy()
        sim_inp['survey'].data['observed'] = observed

        sim = e3.Simulation(model=model, **sim_inp)
        grad = sim.gradient.copy()
        vec = (np.asarray(sim.data.residual)
               * np.asarray(sim.data.weights))
        jt = sim.jtvec(vec)
        np.testing.assert_allclose(jt, grad, rtol=1e-10)


class TestSerialization:

    def test_dict_roundtrip(self, computed_sim):
        model, sim_inp, sim = computed_sim
        d = sim.to_dict(what='all', copy=True)
        sim2 = e3.Simulation.from_dict(d)
        assert sim2._computed
        np.testing.assert_allclose(
            np.asarray(sim2.data.synthetic),
            np.asarray(sim.data.synthetic))
        ef = sim2._dict_get('efield', 'TxED-1', 'f-1')
        assert ef is not None

    def test_file_roundtrip(self, computed_sim, tmp_path):
        model, sim_inp, sim = computed_sim
        fname = str(tmp_path / 'sim.h5')
        sim.to_file(fname, what='results')
        sim2 = e3.Simulation.from_file(fname)
        np.testing.assert_allclose(
            np.asarray(sim2.data.synthetic),
            np.asarray(sim.data.synthetic))

    def test_clean(self):
        model, sim_inp = make_inputs()
        sim = e3.Simulation(model=model, **sim_inp)
        sim.compute(observed=True, add_noise=False)
        _ = sim.misfit
        sim.clean('all')
        assert not sim._computed
        assert sim._misfit is None
        assert np.all(np.isnan(np.asarray(sim.data.synthetic)))
        with pytest.raises(TypeError, match='Unrecognized'):
            sim.clean('nonsense')


class TestFileDir:

    def test_file_based_computation(self, tmp_path):
        """h5-spill mode: fields live on disk, not in memory."""
        model, sim_inp = make_inputs()
        sim = e3.Simulation(model=model, file_dir=str(tmp_path), **sim_inp)
        sim.compute(observed=True, add_noise=False)
        # Stored value is a file name.
        stored = sim._dict_efield['TxED-1']['f-1']
        assert isinstance(stored, str)
        ef = sim.get_efield('TxED-1', 'f-1')
        assert np.all(np.isfinite(ef.field))
        assert sim.misfit < 1e-28


class TestBatchParallel:

    def test_batch_matches_task_quick(self):
        """8³ smoke parity for the quick tier: 3 fixed plain cycles
        run the identical cycle sequence in both engines, so the
        batched fields must equal the per-task fields to near machine
        precision (f64 on the test backend), not just loosely."""
        model, sim_inp = make_inputs(nx=8, nsrc=2, nfreq=1)
        sim_inp = dict(sim_inp)
        sim_inp['solver_opts'] = {'plain': True, 'maxit': 3,
                                  'cycle': 'F', 'tol': 1e-12, 'verb': 0}

        sim_t = e3.Simulation(model=model, **sim_inp)
        sim_t.compute()

        sim_inp2 = dict(sim_inp)
        sim_inp2['survey'] = sim_inp['survey'].copy()
        sim_b = e3.Simulation(model=model, parallel='batch', **sim_inp2)
        sim_b.compute()

        for src in ('TxED-1', 'TxED-2'):
            a = sim_t.get_efield(src, 'f-1').field
            b = sim_b.get_efield(src, 'f-1').field
            # Different executables (vmapped vs per-task) may fuse
            # differently: f64 rounding-level agreement, not bitwise.
            assert np.linalg.norm(b - a) < 1e-9 * np.linalg.norm(a)

    @pytest.mark.slow
    def test_batch_matches_task(self):
        """Sharded batched execution reproduces the per-task solves."""
        model, sim_inp = make_inputs(nsrc=2, nfreq=2)

        sim_t = e3.Simulation(model=model, **sim_inp)
        sim_t.compute()
        ref = np.asarray(sim_t.data.synthetic).copy()

        sim_inp2 = dict(sim_inp)
        sim_inp2['survey'] = sim_inp['survey'].copy()
        sim_b = e3.Simulation(model=model, parallel='batch', **sim_inp2)
        sim_b.compute()
        out = np.asarray(sim_b.data.synthetic)

        # Same physics to solver tolerance (different iteration control).
        np.testing.assert_allclose(out, ref, rtol=1e-4)
        info = sim_b.get_efield_info('TxED-1', 'f-1')
        assert info['exit_message'] == 'CONVERGED'

        # Warm restart: recomputing passes the converged fields as
        # initial guesses -> the batch terminates without cycling.
        sim_b.compute()
        info2 = sim_b.get_efield_info('TxED-1', 'f-1')
        assert info2['it_mg'] == 0
        assert info2['exit_message'] == 'CONVERGED'

    @pytest.mark.slow
    def test_batch_gradient_matches_task(self):
        """parallel='batch' routes the adjoint (_bcompute) through the
        batched engine; the gradient must match the task path (the
        residual source fields stack exactly like forward sources)."""
        model, sim_inp = make_inputs(nsrc=2, nfreq=2)
        model_true = e3.Model(model.grid, property_x=1.2,
                              mapping='Resistivity')
        sim_true = e3.Simulation(model=model_true, **sim_inp)
        sim_true.compute(observed=True, add_noise=False)
        observed = np.asarray(sim_true.data.observed).copy()

        def grad_of(parallel):
            inp = dict(sim_inp)
            inp['survey'] = sim_inp['survey'].copy()
            inp['survey'].data['observed'] = observed
            sim = e3.Simulation(model=model, parallel=parallel, **inp)
            return np.asarray(sim.gradient)

        g_task = grad_of('task')
        g_batch = grad_of('batch')
        # Fields solved to 5e-7 under different iteration control; the
        # gradients agree to well below that in aggregate.
        diff = np.linalg.norm(g_batch - g_task)
        assert diff < 1e-4 * np.linalg.norm(g_task)

    @pytest.mark.slow
    def test_batch_jvec_matches_task(self):
        """jvec in batch mode == jvec through the task engine."""
        model, sim_inp = make_inputs(nsrc=2)

        def jvec_of(parallel):
            inp = dict(sim_inp)
            inp['survey'] = sim_inp['survey'].copy()
            sim = e3.Simulation(model=model, parallel=parallel, **inp)
            sim.compute(observed=True, add_noise=False)
            rng = np.random.default_rng(7)
            v = rng.normal(size=model.grid.shape_cells)
            return np.asarray(sim.jvec(v))

        j_task = jvec_of('task')
        j_batch = jvec_of('batch')
        mask = np.isfinite(j_task)
        assert (np.linalg.norm((j_batch - j_task)[mask])
                < 1e-4 * np.linalg.norm(j_task[mask]))

    @pytest.mark.slow
    def test_batch_production_config(self):
        """The reference's default production configuration — MG-
        preconditioned BiCGSTAB with semicoarsening + line relaxation
        (reference emg3d/solver.py:82-140) — runs in the sharded batch
        path and reproduces the per-task solves.

        The per-task reference runs the plain config (its executables
        are shared with test_batch_matches_task; both solve the same
        physics to tolerance).  Caches are cleared first: the batched
        line smoothers alone push the process towards the
        vm.max_map_count LLVM segfault (see conftest).
        """
        import jax
        jax.clear_caches()

        model, sim_inp = make_inputs(nsrc=2)
        sim_t = e3.Simulation(model=model, **sim_inp)
        sim_t.compute()
        ref = np.asarray(sim_t.data.synthetic).copy()

        sim_inp2 = dict(sim_inp)
        sim_inp2['survey'] = sim_inp['survey'].copy()
        sim_inp2['solver_opts'] = {
            'sslsolver': True, 'semicoarsening': True,
            'linerelaxation': True, 'tol': 5e-7, 'verb': 0}
        sim_b = e3.Simulation(model=model, parallel='batch', **sim_inp2)
        sim_b.compute()
        out = np.asarray(sim_b.data.synthetic)

        np.testing.assert_allclose(out, ref, rtol=1e-4)
        info = sim_b.get_efield_info('TxED-1', 'f-1')
        assert info['exit_message'] == 'CONVERGED'
        assert info['it_ssl'] > 0

    def test_batch_rejects_unbatchable_krylov(self):
        from emg3d_tpu.parallel import batch
        model, sim_inp = make_inputs()
        with pytest.raises(ValueError, match='no batched form'):
            batch.solve_batch(model, [(0., 0., 0., 0., 0.)], [1.0],
                              sslsolver='cgs')

    @pytest.mark.slow
    @pytest.mark.parametrize('gridding', ['frequency', 'source'])
    def test_batch_gridding_groups(self, gridding):
        """Non-'same' gridding parallelizes in batch mode: tasks are
        grouped by their shared grid (one batched solve per group) and
        reproduce the sequential task loop (reference behavior: the
        process pool parallelizes ANY mode, _multiprocessing.py:33-69)."""
        import jax
        jax.clear_caches()

        model, sim_inp = make_inputs(nsrc=2, nfreq=2)

        def synthetic_of(parallel):
            inp = dict(sim_inp)
            inp['survey'] = sim_inp['survey'].copy()
            inp['gridding'] = gridding
            inp['gridding_opts'] = {
                'center': (0., 0., 0.), 'properties': 1.0,
                'domain': ([-800., 800.], [-800., 800.], [-800., 800.]),
                'min_width_limits': [100., 100.],
                'center_on_edge': True,
            }
            sim = e3.Simulation(model=model, parallel=parallel, **inp)
            sim.compute()
            ngroups = len(sim._batch_groups(sim._srcfreq))
            return np.asarray(sim.data.synthetic).copy(), ngroups

        ref, _ = synthetic_of('task')
        out, ngroups = synthetic_of('batch')
        assert ngroups == 2          # two sharing units, each batched
        np.testing.assert_allclose(out, ref, rtol=1e-6)


class TestGriddingModes:

    def test_same_requires_no_opts(self):
        model, sim_inp = make_inputs()
        with pytest.raises(TypeError, match='not permitted'):
            e3.Simulation(model=model, gridding_opts={'center': (0, 0, 0)},
                          **sim_inp)

    def test_input_gridding(self):
        model, sim_inp = make_inputs()
        sim_inp = dict(sim_inp)
        sim_inp['gridding'] = 'input'
        h = np.ones(8) * 200.0
        grid_in = meshes.TensorMesh([h, h, h], origin=(-800.,) * 3)
        sim = e3.Simulation(model=model, gridding_opts=grid_in, **sim_inp)
        assert sim.get_grid('TxED-1', 'f-1') is grid_in
        # Model gets interpolated to the coarse grid.
        m = sim.get_model('TxED-1', 'f-1')
        assert m.shape == (8, 8, 8)

    def test_unknown_kwargs(self):
        model, sim_inp = make_inputs()
        with pytest.raises(TypeError, match='Unexpected '):
            e3.Simulation(model=model, nonsense=True, **sim_inp)


class TestMapsAdjoints:
    """Unit dot-tests for the native gradient/jvec building blocks."""

    def test_volume_average_adjoint(self):
        rng = np.random.default_rng(4)
        og = meshes.BaseMesh([np.ones(6) * 100., np.ones(5) * 120.,
                              np.ones(4) * 90.], origin=(0., 0., 0.))
        ng = meshes.BaseMesh(
            [rng.uniform(50, 150, 9), rng.uniform(50, 150, 7),
             rng.uniform(50, 150, 8)], origin=(-20., 10., -30.))

        v = rng.standard_normal(og.shape_cells)
        w = rng.standard_normal((3, *ng.shape_cells))

        # Forward: volume-average og -> ng.
        fwd = maps.interpolate(grid=og, values=v, xi=ng, method='volume',
                               extrapolate=True, log=False)
        lhs = np.sum(fwd[None] * w)

        adj = np.zeros((3, *og.shape_cells))
        maps.interp_volume_average_adj(adj, og, w, ng)
        rhs = np.sum(v[None] * adj)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-11)

    def test_edge_deriv_is_adjoint_of_edges_to_cells(self):
        rng = np.random.default_rng(5)
        grid = meshes.BaseMesh(
            [rng.uniform(50, 150, 5), rng.uniform(50, 150, 6),
             rng.uniform(50, 150, 4)], origin=(0., 0., 0.))
        shape = grid.shape_cells

        efield = e3.Field(grid)
        efield.field = (rng.standard_normal(efield.field.shape)
                        + 1j * rng.standard_normal(efield.field.shape))

        v = rng.standard_normal(shape)  # cell vector
        w = e3.Field(grid)              # edge-shaped test field
        w.field = (rng.standard_normal(w.field.shape)
                   + 1j * rng.standard_normal(w.field.shape))

        # Forward: G(v)·E on edges.
        gv = maps.edge_product_deriv_times_vector(efield, v)
        lhs = np.real(np.vdot(w.field, gv))

        # Adjoint: edges -> cells of Re(conj(w)*E), summed over components
        # (the cells-to-edges map is real, so Re commutes with it).
        gf = e3.Field(grid, data=np.real(np.conj(w.field) * efield.field))
        out = np.zeros((3, *shape))
        vol = grid.cell_volumes.reshape(shape, order='F')
        maps.interp_edges_to_vol_averages(
            ex=gf.fx, ey=gf.fy, ez=gf.fz, volumes=vol,
            ox=out[0], oy=out[1], oz=out[2])
        rhs = np.sum(v * np.real(out.sum(0)))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-11)


class TestLayered:
    """Layered (1-D) mode with the native engine (ref simulations.py:882)."""

    def make_sim(self, **kwargs):
        h = np.ones(16) * 100.0
        grid = meshes.TensorMesh([h, h, h], origin=(-800.,) * 3)
        model = e3.Model(grid, property_x=1.0, mapping='Resistivity')
        src = electrodes.TxElectricDipole((0., 0., 0., 0., 0.))
        recs = [electrodes.RxElectricPoint((x, 60., 0., 0., 0.))
                for x in [300., 400.]]
        survey = surveys.Survey([src], recs, [1.0], relative_error=0.05)
        sim = e3.Simulation(
            survey=survey, model=model, gridding='same', layered=True,
            tqdm_opts=False, receiver_interpolation='linear', **kwargs)
        return sim

    def test_forward_vs_analytical(self):
        sim = self.make_sim()
        assert sim.layered_opts['method'] == 'cylinder'
        assert 'radius' in sim.layered_opts['ellipse']
        sim.compute()
        syn = np.asarray(sim.data.synthetic)

        pts = np.array([[300., 60., 0.], [400., 60., 0.]])
        exact = alternatives.fullspace_dipole(
            pts, (0., 0., 0.), 1.0, 1.0)
        # Uniform model: the layered engine is near-analytic.
        np.testing.assert_allclose(syn[0, :, 0], exact[:, 0], rtol=1e-3)

    def test_gradient_fd(self):
        sim = self.make_sim()
        sim.compute(observed=True, add_noise=False)
        # Perturb observed so the misfit is non-zero.
        sim.data['observed'] = sim.data.observed * 1.1
        grad = sim.gradient
        assert grad.shape == (16, 16, 16)
        assert np.isfinite(grad).all()
        assert np.abs(grad).max() > 0

    def test_source_freq_combo_raises(self):
        sim = self.make_sim()
        with pytest.raises(NotImplementedError, match='layered'):
            sim.compute(source='TxED-1', frequency='f-1')

    def test_triaxial_raises(self):
        h = np.ones(16) * 100.0
        grid = meshes.TensorMesh([h, h, h], origin=(-800.,) * 3)
        model = e3.Model(grid, property_x=1.0, property_y=2.0,
                         property_z=3.0)
        src = electrodes.TxElectricDipole((0., 0., 0., 0., 0.))
        survey = surveys.Survey(
            [src], [electrodes.RxElectricPoint((300., 0., 0., 0., 0.))],
            [1.0], relative_error=0.05)
        with pytest.raises(NotImplementedError, match='triaxial'):
            e3.Simulation(survey=survey, model=model, gridding='same',
                          layered=True, tqdm_opts=False)


class TestAutoGridding:
    """Gridding modes with automatic mesh construction (no solves)."""

    def make(self, gridding, frequencies=(0.5, 2.0), **kwargs):
        gopts = kwargs.pop('gridding_opts', {})
        h = np.ones(16) * 200.0
        grid = meshes.TensorMesh([h, h, h], origin=(-1600.,) * 3)
        model = e3.Model(grid, property_x=1.0, mapping='Resistivity')
        sources = [electrodes.TxElectricDipole((x, 0., -200., 0., 0.))
                   for x in [-300., 300.]]
        recs = [electrodes.RxElectricPoint((x, 0., -250., 0., 0.))
                for x in [600., 900.]]
        survey = surveys.Survey(sources, recs, list(frequencies),
                                relative_error=0.05)
        return e3.Simulation(
            survey=survey, model=model, gridding=gridding,
            gridding_opts=gopts, tqdm_opts=False,
            solver_opts={'plain': True, 'verb': 0}, **kwargs)

    def test_single(self):
        sim = self.make('single')
        g1 = sim.get_grid('TxED-1', 'f-1')
        g2 = sim.get_grid('TxED-2', 'f-2')
        assert g1 is g2  # One grid for everything.
        good = meshes.good_mg_cell_nr()
        assert all(n in good for n in g1.shape_cells)
        # Model interpolates onto it.
        m = sim.get_model('TxED-1', 'f-1')
        assert m.shape == g1.shape_cells

    def test_frequency(self):
        sim = self.make('frequency')
        g_lo = sim.get_grid('TxED-1', 'f-1')
        g_hi = sim.get_grid('TxED-1', 'f-2')
        assert g_lo is sim.get_grid('TxED-2', 'f-1')  # shared per freq
        assert g_lo is not g_hi
        # Lower frequency -> larger skin depth -> larger extent.
        ext_lo = g_lo.nodes_x[-1] - g_lo.nodes_x[0]
        ext_hi = g_hi.nodes_x[-1] - g_hi.nodes_x[0]
        assert ext_lo > ext_hi

    def test_source(self):
        sim = self.make('source')
        g1 = sim.get_grid('TxED-1', 'f-1')
        assert g1 is sim.get_grid('TxED-1', 'f-2')
        assert g1 is not sim.get_grid('TxED-2', 'f-1')

    def test_both(self):
        sim = self.make('both')
        grids = {sim.get_grid(s, f) for s in ('TxED-1', 'TxED-2')
                 for f in ('f-1', 'f-2')}
        assert len(grids) == 4

    def test_shape_classes(self):
        """shape_classes collapses per-frequency shapes onto classes.

        XLA compiles per grid shape; the snapped Simulation must (a)
        produce fewer distinct shapes, (b) only grow grids outward
        (survey-domain discretization untouched), (c) keep every
        dimension a good MG number, (d) round-trip through to_dict.
        """
        freqs = [0.1, 0.5, 2.0, 8.0]
        plain = self.make('frequency', frequencies=freqs)
        # This survey's shapes spread over a 1.67x-per-dim range; a 1.7
        # growth bound collapses them (the 1.35 default is conservative).
        snapped = self.make('frequency', frequencies=freqs,
                            shape_classes=1.7)
        fkeys = [f'f-{i + 1}' for i in range(len(freqs))]
        shapes_plain = {plain.get_grid('TxED-1', f).shape_cells
                        for f in fkeys}
        shapes_snap = {snapped.get_grid('TxED-1', f).shape_cells
                       for f in fkeys}
        assert len(shapes_plain) > 1         # problem is multi-shape
        assert len(shapes_snap) < len(shapes_plain)
        good = meshes.good_mg_cell_nr()
        for f in fkeys:
            g0 = plain.get_grid('TxED-1', f)
            g1 = snapped.get_grid('TxED-1', f)
            assert all(n in good for n in g1.shape_cells)
            # Outward-only growth: the original node set survives as a
            # contiguous interior run of the padded grid.
            for d, (n0, n1) in enumerate(zip(g0.shape_cells,
                                             g1.shape_cells)):
                assert n1 >= n0
                nodes0 = g0.origin[d] + np.r_[
                    0.0, np.cumsum(g0.h[d])]
                nodes1 = g1.origin[d] + np.r_[
                    0.0, np.cumsum(g1.h[d])]
                i = np.searchsorted(nodes1, nodes0[0] - 1e-9)
                assert np.allclose(nodes1[i:i + nodes0.size], nodes0)
        # Round-trip keeps the flag.
        sim2 = e3.Simulation.from_dict(snapped.to_dict('plain'))
        assert sim2.shape_classes == 1.7
        sim3 = e3.Simulation.from_dict(
            self.make('frequency', shape_classes=True).to_dict('plain'))
        assert sim3.shape_classes is True

    def test_shape_classes_growth_bound(self):
        """A tiny max_growth forbids any collapsing (classes = shapes)."""
        freqs = [0.1, 0.5, 2.0, 8.0]
        plain = self.make('frequency', frequencies=freqs)
        strict = self.make('frequency', frequencies=freqs,
                           shape_classes=1.0)
        fkeys = [f'f-{i + 1}' for i in range(len(freqs))]
        for f in fkeys:
            assert (strict.get_grid('TxED-1', f).shape_cells
                    == plain.get_grid('TxED-1', f).shape_cells)
