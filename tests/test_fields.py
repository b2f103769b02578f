"""Tests for Field, source fields, receivers, magnetic fields
(reference tests/test_fields.py)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose
from scipy import constants as const

from emg3d_tpu import electrodes, fields, meshes, models


def make_grid(n=6, w=100.0):
    return meshes.TensorMesh([np.ones(n) * w] * 3, origin=(-n * w / 2,) * 3)


class TestField:

    def test_init_and_views(self):
        grid = make_grid()
        f = fields.Field(grid)
        assert f.field.dtype == np.complex128
        assert f.field.size == grid.n_edges
        assert f.fx.shape == grid.shape_edges_x
        assert f.fy.shape == grid.shape_edges_y
        assert f.fz.shape == grid.shape_edges_z

        # Views write through.
        f.fx[1, 2, 3] = 5 + 1j
        assert f.field[np.flatnonzero(f.field)][0] == 5 + 1j

    def test_magnetic_flag(self):
        grid = make_grid()
        f = fields.Field(grid, electric=False)
        assert f.field.size == grid.n_faces
        assert f.fx.shape == grid.shape_faces_x

    def test_frequency_dtypes(self):
        grid = make_grid()
        f = fields.Field(grid, frequency=1.0)
        assert f.field.dtype == np.complex128
        assert_allclose(f.sval, 2j * np.pi)
        assert_allclose(f.smu0, 2j * np.pi * const.mu_0)

        fl = fields.Field(grid, frequency=-2.0)
        assert fl.field.dtype == np.float64
        assert_allclose(fl.sval, 2.0)
        assert_allclose(fl.smu0, 2.0 * const.mu_0)
        assert fl.frequency == 2.0  # reported positive

        with pytest.raises(ValueError, match='0 Hz'):
            fields.Field(grid, frequency=0.0)

    def test_copy_eq_dict(self):
        grid = make_grid()
        f = fields.Field(grid, frequency=1.0)
        f.fx[...] = 1 + 1j
        f2 = f.copy()
        assert f == f2
        f2.fy[0, 0, 0] = 9.
        assert f != f2

        d = f.to_dict()
        f3 = fields.Field.from_dict(d)
        assert f == f3

    def test_interpolate_to_grid(self):
        grid = make_grid(6)
        f = fields.Field(grid, frequency=1.0)
        f.fx[...] = 1.0
        fine = make_grid(12, 50.0)
        f2 = f.interpolate_to_grid(fine)
        assert f2.grid is fine
        # Interior x-edges of the constant field stay ~1.
        assert_allclose(f2.fx[3:-3, 3:-3, 3:-3], 1.0, rtol=1e-10)


class TestGetSourceField:

    def test_moment_normalization(self):
        """Geometric source vector integrates to the unit moment."""
        grid = make_grid()
        # Moment = strength * length: 1 for unit dipoles/points, 100 for
        # the 100 m flat-format dipole.
        for src, moment in [
                ((0., 0., 0., 0., 0.), 1.0),
                (electrodes.TxElectricPoint((0., 0., 0., 0., 0.)), 1.0),
                (electrodes.TxElectricDipole(
                    (-50., 50., 0., 0., 0., 0.)), 100.0)]:
            sf = fields.get_source_field(grid, src, 1.0)
            v = sf.field / -sf.smu0
            vf = fields.Field(grid, data=v)
            assert_allclose(np.sum(vf.fx), moment, atol=1e-12)
            assert_allclose(np.sum(vf.fy), 0.0, atol=1e-12)
            assert_allclose(np.sum(vf.fz), 0.0, atol=1e-12)

    def test_rotated_dipole_moment(self):
        grid = make_grid()
        sf = fields.get_source_field(grid, (10., 20., -30., 30., 50.), 1.0)
        v = fields.Field(grid, data=sf.field / -sf.smu0)
        p = electrodes.rotation(30., 50.)
        assert_allclose([np.sum(v.fx), np.sum(v.fy), np.sum(v.fz)], p,
                        atol=1e-10)

    def test_strength(self):
        grid = make_grid()
        sf1 = fields.get_source_field(grid, (0., 0., 0., 0., 0.), 1.0)
        sf2 = fields.get_source_field(grid, (0., 0., 0., 0., 0.), 1.0,
                                      strength=-3.3)
        assert_allclose(sf2.field, -3.3 * sf1.field, rtol=1e-12)

    def test_wire_vs_dipole(self):
        grid = make_grid()
        pts = np.array([[-50., 0., 0.], [50., 0., 0.]])
        sfw = fields.get_source_field(
            grid, electrodes.TxElectricWire(pts), 1.0)
        sfd = fields.get_source_field(
            grid, electrodes.TxElectricDipole(pts), 1.0)
        assert_allclose(sfw.field, sfd.field, rtol=1e-12)

    def test_outside_grid_raises(self):
        grid = make_grid()
        with pytest.raises(ValueError, match='outside'):
            fields.get_source_field(grid, (1e4, 0., 0., 0., 0.), 1.0)

    def test_laplace_source(self):
        grid = make_grid()
        sf = fields.get_source_field(grid, (0., 0., 0., 0., 0.), -3.0)
        assert sf.field.dtype == np.float64


class TestGetReceiver:

    def setup_method(self):
        self.grid = make_grid(8)
        self.field = fields.Field(self.grid, frequency=1.0)
        # Smooth linear Ex(x) field for interpolation checks.
        ccx = self.grid.cell_centers_x[:, None, None]
        self.field.fx[...] = (1.0 + 1e-3 * ccx) * (1 + 1j)

    def test_interpolation(self):
        resp = fields.get_receiver(
            self.field, ([-120., 80.], [10., 10.], [5., 5.], 0, 0),
            method='linear')
        exact = (1.0 + 1e-3 * np.array([-120., 80.])) * (1 + 1j)
        assert_allclose(resp, exact, rtol=1e-10)

    def test_nan_outside_and_boundary(self):
        resp = fields.get_receiver(
            self.field, ([0., 1e4, -390.], [0.] * 3, [0.] * 3, 0, 0))
        assert np.isfinite(resp[0])
        assert np.isnan(resp[1])       # outside the grid
        assert np.isnan(resp[2])       # in the outermost (PEC) cell

    def test_rotation_factors(self):
        # Receiver at azimuth 90 reads Ey; our field has Ey = 0.
        resp = fields.get_receiver(
            self.field, ([0.], [10.], [5.], 90, 0), method='linear')
        assert_allclose(resp, 0.0, atol=1e-12)

    def test_receiver_instance(self):
        rec = electrodes.RxElectricPoint((80., 10., 5., 0., 0.))
        r1 = fields.get_receiver(self.field, rec, method='linear')
        r2 = fields.get_receiver(
            self.field, ([80.], [10.], [5.], 0, 0), method='linear')
        assert_allclose(r1, r2)

    def test_emarray(self):
        resp = fields.get_receiver(
            self.field, ([0., 80.], [10.] * 2, [5.] * 2, 0, 0))
        assert hasattr(resp, 'amp')
        assert hasattr(resp, 'pha')


class TestGetMagneticField:

    def test_vs_curl_oracle(self):
        """H = curl(E) / (smu0 mu_r), via dual-grid averaged factors."""
        grid = make_grid(6)
        model = models.Model(grid, property_x=2.0)
        efield = fields.Field(grid, frequency=1.0)
        rng = np.random.default_rng(11)
        efield.field = (rng.standard_normal(efield.field.shape)
                        + 1j * rng.standard_normal(efield.field.shape))

        hfield = fields.get_magnetic_field(model, efield)
        assert hfield.field.size == grid.n_faces
        assert hfield._frequency == efield._frequency

        # Oracle on an interior x-face (i, j, k): curl_x =
        # dEz/dy - dEy/dz, with uniform spacings h.
        i, j, k = 3, 2, 2
        h = 100.0
        curl_x = ((efield.fz[i, j + 1, k] - efield.fz[i, j, k]) / h
                  - (efield.fy[i, j, k + 1] - efield.fy[i, j, k]) / h)
        expected = curl_x / efield.smu0  # mu_r = 1
        assert_allclose(hfield.fx[i, j, k], expected, rtol=1e-10)

    def test_mu_r_scaling(self):
        grid = make_grid(6)
        efield = fields.Field(grid, frequency=1.0)
        rng = np.random.default_rng(12)
        efield.field = rng.standard_normal(efield.field.shape) * (1 + 1j)

        m1 = models.Model(grid, 1.0, mu_r=1.0)
        m2 = models.Model(grid, 1.0, mu_r=4.0)
        h1 = fields.get_magnetic_field(m1, efield)
        h2 = fields.get_magnetic_field(m2, efield)
        assert_allclose(h2.field, h1.field / 4.0, rtol=1e-10)
