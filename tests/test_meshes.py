"""Tests for meshes: BaseMesh/TensorMesh + automatic gridding
(reference tests/test_meshes.py)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from emg3d_tpu import electrodes, meshes, surveys
from emg3d_tpu.models import Model


class TestBaseMesh:

    def test_counts_and_coords(self):
        grid = meshes.BaseMesh(
            [np.ones(4) * 10., np.ones(3) * 20., np.ones(2) * 30.],
            origin=(100., 200., 300.))
        assert grid.shape_cells == (4, 3, 2)
        assert grid.n_cells == 24
        assert grid.shape_nodes == (5, 4, 3)
        assert_allclose(grid.nodes_x, 100. + np.arange(5) * 10.)
        assert_allclose(grid.cell_centers_y, [210., 230., 250.])
        assert grid.shape_edges_x == (4, 4, 3)
        assert grid.n_edges == 4 * 4 * 3 + 5 * 3 * 3 + 5 * 4 * 2
        assert grid.shape_faces_z == (4, 3, 3)
        assert_allclose(grid.cell_volumes, 6000.)
        assert grid.cell_volumes_3d.shape == (4, 3, 2)

    def test_repr(self):
        grid = meshes.BaseMesh([np.ones(4)] * 3, origin=(0, 0, 0))
        assert '4 x 4 x 4' in repr(grid)


class TestTensorMesh:

    def test_eq_copy_dict(self):
        g1 = meshes.TensorMesh([np.ones(4), np.ones(5), np.ones(6)],
                               origin=(0., 0., 0.))
        g2 = g1.copy()
        assert g1 == g2
        g3 = meshes.TensorMesh([np.ones(4), np.ones(5), np.ones(6)],
                               origin=(1., 0., 0.))
        assert g1 != g3
        assert g1 != 'a string'

        d = g1.to_dict()
        assert d['__class__'] == 'TensorMesh'
        g4 = meshes.TensorMesh.from_dict(d)
        assert g1 == g4

    def test_hashable(self):
        g1 = meshes.TensorMesh([np.ones(4)] * 3, origin=(0., 0., 0.))
        g2 = meshes.TensorMesh([np.ones(4)] * 3, origin=(0., 0., 0.))
        assert hash(g1) == hash(g2)
        assert len({g1, g2}) == 1


class TestHelpers:

    def test_skin_depth(self):
        # delta = sqrt(2 / (omega mu sigma)) = 503.3/sqrt(f sigma).
        assert_allclose(meshes.skin_depth(1.0, 1.0), 503.29212, rtol=1e-5)
        assert_allclose(meshes.skin_depth(100., 0.01),
                        meshes.skin_depth(1.0, 1.0), rtol=1e-12)
        # Laplace domain (negative frequency).
        d_lap = meshes.skin_depth(-1.0, 1.0)
        assert d_lap > 0

    def test_wavelength(self):
        assert_allclose(meshes.wavelength(10.), 2 * np.pi * 10.)

    def test_cell_width(self):
        assert_allclose(meshes.cell_width(300., pps=3), 100.)
        assert_allclose(meshes.cell_width(300., pps=3, limits=150.), 150.)
        assert_allclose(
            meshes.cell_width(300., pps=1, limits=[20., 200.]), 200.)

    def test_good_mg_cell_nr(self):
        nrs = meshes.good_mg_cell_nr(max_nr=128, max_lowest=5, min_div=3)
        assert 16 in nrs and 48 in nrs and 128 in nrs
        # All entries = p * 2^n with p <= 5, n >= 3.
        for nr in nrs:
            n = 0
            while nr % 2 == 0:
                nr //= 2
                n += 1
            assert n >= 3 and nr <= 5

    def test_check_mesh_warns(self):
        bad = meshes.TensorMesh([np.ones(7)] * 3, origin=(0., 0., 0.))
        with pytest.warns(UserWarning, match='not optimal'):
            meshes.check_mesh(bad)


class TestConstructMesh:

    def test_basic(self):
        grid = meshes.construct_mesh(
            frequency=1.0, properties=1.0, center=(0., 0., 0.),
            domain=([-2000., 2000.], [-2000., 2000.], [-2000., 2000.]))
        # MG-friendly cell counts.
        good = meshes.good_mg_cell_nr()
        for n in grid.shape_cells:
            assert n in good
        # Domain covered.
        assert grid.nodes_x[0] <= -2000.
        assert grid.nodes_x[-1] >= 2000.
        # Center on edge by default.
        assert np.any(np.isclose(grid.nodes_x, 0.0))

    def test_per_direction_properties(self):
        grid = meshes.construct_mesh(
            frequency=0.5, properties=[0.3, 10., 100., 1e8],
            center=(0., 0., -1000.),
            domain=([-1000., 1000.], [-1000., 1000.], [-2500., 0.]))
        assert grid.nodes_z[0] <= -2500.
        assert grid.nodes_z[-1] >= 0.

    def test_vector_passthrough(self):
        x = np.arange(-480., 481., 60.)
        grid = meshes.construct_mesh(
            frequency=1.0, properties=1.0, center=(0., 0., 0.),
            vector=(x, x, x))
        # The vector region is embedded in the final grid.
        ix = np.searchsorted(grid.nodes_x, x[0] - 1.0)
        assert_allclose(grid.nodes_x[ix:ix + x.size], x, atol=1e-9)

    def test_stretching_limited(self):
        grid = meshes.construct_mesh(
            frequency=1.0, properties=1.0, center=(0., 0., 0.),
            domain=([-1000., 1000.],) * 3, stretching=[1.0, 1.3])
        hx = grid.h[0]
        # Survey domain cells uniform (stretching 1.0 there).
        core = hx[(grid.cell_centers_x > -1000.)
                  & (grid.cell_centers_x < 1000.)]
        assert np.ptp(core) / core.min() < 1e-10
        # Buffer growth bounded by 1.3 (+ tolerance).
        ratios = hx[1:] / hx[:-1]
        assert ratios.max() <= 1.3 + 1e-9

    def test_distance_instead_of_domain(self):
        grid = meshes.construct_mesh(
            frequency=1.0, properties=1.0, center=(0., 0., 0.),
            distance=[[1500., 500.]] * 3)
        assert grid.nodes_x[0] <= -1500.
        assert grid.nodes_x[-1] >= 500.


class TestEstimateGriddingOpts:

    def setup_method(self):
        h = np.ones(16) * 200.
        self.grid = meshes.TensorMesh([h, h, h], origin=(-1600.,) * 3)
        self.model = Model(self.grid, property_x=1.0,
                           mapping='Resistivity')
        src = electrodes.TxElectricDipole((0., 0., -100., 0., 0.))
        recs = [electrodes.RxElectricPoint((x, 0., -200., 0., 0.))
                for x in [600., 900.]]
        self.survey = surveys.Survey(
            [src], recs, frequencies=[0.5, 2.0], relative_error=0.05)

    def test_defaults_filled(self):
        gopts = meshes.estimate_gridding_opts({}, self.model, self.survey)
        # Frequency: log-mean of 0.5 and 2 -> 1.0.
        assert_allclose(gopts['frequency'], 1.0)
        assert 'properties' in gopts
        assert 'center' in gopts
        assert_allclose(gopts['center'][0], 0.)
        # The returned opts must construct a valid mesh.
        grid = meshes.construct_mesh(**gopts)
        assert all(n >= 16 for n in grid.shape_cells)

    def test_provided_kept(self):
        gopts = meshes.estimate_gridding_opts(
            {'frequency': 7.0, 'center': (1., 2., 3.)},
            self.model, self.survey)
        assert gopts['frequency'] == 7.0
        assert gopts['center'] == (1., 2., 3.)

    def test_vector_xyz_string(self):
        gopts = meshes.estimate_gridding_opts(
            {'vector': 'xz'}, self.model, self.survey)
        vec = gopts['vector']
        assert_allclose(vec['x'], self.grid.nodes_x)
        assert vec['y'] is None
        assert_allclose(vec['z'], self.grid.nodes_z)


class TestShapeClasses:
    """pad_mesh_cells + snap_shapes (cold-start shape classing)."""

    def test_pad_mesh_cells(self):
        h = [np.ones(8) * 10., np.ones(12) * 20., np.ones(16) * 30.]
        grid = meshes.TensorMesh(h, origin=(0., 0., 0.))
        out = meshes.pad_mesh_cells(grid, (12, 12, 17), alpha=1.5)
        assert out.shape_cells == (12, 12, 17)
        # Untouched dimension is identical.
        assert_allclose(out.h[1], grid.h[1])
        assert out.origin[1] == 0.0
        # Padded: originals survive contiguously, extras grow outward.
        assert_allclose(out.h[0][2:10], grid.h[0])
        assert_allclose(out.h[0][:2], [10. * 1.5 ** 2, 10. * 1.5])
        assert_allclose(out.h[0][10:], [10. * 1.5, 10. * 1.5 ** 2])
        assert_allclose(out.origin[0], -10. * (1.5 + 1.5 ** 2))
        # Odd extra count: the extra cell goes to the upper side.
        assert_allclose(out.h[2][0], 30.)
        assert out.origin[2] == 0.0
        assert_allclose(out.h[2][-1], 30. * 1.5)
        assert out.h[2].size == 17

    def test_pad_mesh_cells_shrink_raises(self):
        grid = meshes.TensorMesh([np.ones(8) * 10.] * 3, origin=(0.,) * 3)
        with pytest.raises(ValueError, match="smaller than mesh"):
            meshes.pad_mesh_cells(grid, (4, 8, 8))

    def test_snap_shapes(self):
        shapes = [(48, 48, 32), (64, 48, 40), (64, 64, 40), (128, 96, 80)]
        out = meshes.snap_shapes(shapes, max_growth=1.35)
        # 48 joins 64 (64/48 = 1.33 <= 1.35); 128 stays alone.
        assert out[(48, 48, 32)] == (64, 64, 40)
        assert out[(64, 48, 40)] == (64, 64, 40)
        assert out[(64, 64, 40)] == (64, 64, 40)
        assert out[(128, 96, 80)] == (128, 96, 80)
        # Representatives are always existing values >= the member.
        for s, c in out.items():
            assert all(cc >= ss for ss, cc in zip(s, c))

    def test_snap_shapes_growth_one(self):
        shapes = [(48, 48, 32), (64, 48, 40)]
        out = meshes.snap_shapes(shapes, max_growth=1.0)
        assert out == {s: s for s in shapes}
