"""Tests for Model/VolumeModel (reference tests/test_models.py)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import emg3d_tpu as e3
from emg3d_tpu import fields, meshes, models
from scipy import constants as const


def make_grid(nx=4, ny=3, nz=2):
    return meshes.TensorMesh(
        [np.ones(nx) * 10., np.ones(ny) * 20., np.ones(nz) * 40.],
        origin=(0., 0., 0.))


class TestModel:

    def test_cases(self):
        grid = make_grid()
        assert models.Model(grid, 1.).case == 'isotropic'
        assert models.Model(grid, 1., property_y=2.).case == 'HTI'
        assert models.Model(grid, 1., property_z=2.).case == 'VTI'
        assert models.Model(grid, 1., property_y=2.,
                            property_z=3.).case == 'triaxial'

    def test_scalar_expansion(self):
        grid = make_grid()
        m = models.Model(grid, 2.5)
        assert m.property_x.shape == grid.shape_cells
        assert_allclose(m.property_x, 2.5)

    def test_shapes_and_validation(self):
        grid = make_grid()
        vals = np.arange(1., 25.).reshape(grid.shape_cells, order='F')
        m = models.Model(grid, vals)
        assert_allclose(m.property_x, vals)

        with pytest.raises(ValueError, match='could not be broadcast|shape'):
            models.Model(grid, np.ones((2, 2, 2)))
        with pytest.raises(ValueError, match='positive|bigger'):
            models.Model(grid, -1.0)
        with pytest.raises(ValueError, match='positive|bigger|finite'):
            models.Model(grid, np.nan)

    def test_log_maps_allow_negative(self):
        grid = make_grid()
        m = models.Model(grid, -2.0, mapping='LgResistivity')
        assert_allclose(m.property_x, -2.0)

    def test_operators(self):
        grid = make_grid()
        m1 = models.Model(grid, 2.0, mu_r=1.5)
        m2 = models.Model(grid, 1.5, mu_r=1.0)
        madd = m1 + m2
        assert_allclose(madd.property_x, 3.5)
        assert_allclose(madd.mu_r, 2.5)
        msub = m1 - m2
        assert_allclose(msub.property_x, 0.5)
        assert m1 == m1.copy()
        assert m1 != m2

        # Mismatching cases raise.
        m3 = models.Model(grid, 1.0, property_y=2.0)
        with pytest.raises(ValueError, match='anisotropy|mu_r'):
            m1 + m3

    def test_dict_roundtrip(self):
        grid = make_grid()
        m = models.Model(grid, 2.0, property_z=3.0, mu_r=1.2,
                         epsilon_r=1.0, mapping='LnConductivity')
        d = m.to_dict()
        m2 = models.Model.from_dict(d)
        assert m == m2
        assert m2.case == 'VTI'
        assert m2.map.name == 'LnConductivity'

    def test_interpolate_to_grid(self):
        grid = make_grid(8, 8, 8)
        vals = np.ones(grid.shape_cells)
        vals[:4] = 2.0
        m = models.Model(grid, vals)
        coarse = meshes.TensorMesh(
            [np.ones(4) * 20., np.ones(4) * 40., np.ones(4) * 80.],
            origin=(0., 0., 0.))
        mc = m.interpolate_to_grid(coarse)
        assert mc.shape == (4, 4, 4)
        assert mc.property_x.min() >= 1.0 - 1e-10
        assert mc.property_x.max() <= 2.0 + 1e-10
        # Same grid: returns self.
        assert m.interpolate_to_grid(grid) is m

    def test_extract_1d(self):
        grid = make_grid(8, 8, 8)
        vals = np.ones(grid.shape_cells)
        vals[:, :, 4:] = 10.0  # layered in z
        m = models.Model(grid, vals)
        layered = m.extract_1d('midpoint', p0=(25., 25.))
        assert layered.shape[0] == 1 and layered.shape[1] == 1
        assert_allclose(np.unique(layered.property_x), [1.0, 10.0])
        layered2, imat = m.extract_1d('midpoint', p0=(25., 25.),
                                      return_imat=True)
        assert imat is not None


class TestVolumeModel:

    def test_eta_zeta_formulas(self):
        grid = make_grid()
        res = 2.0  # Ohm.m
        m = models.Model(grid, res, mapping='Resistivity')
        sfield = fields.get_source_field(
            grid, (5., 5., 5., 0., 0.), frequency=1.0)
        vm = models.VolumeModel(m, sfield)

        vol = grid.cell_volumes.reshape(grid.shape_cells, order='F')
        smu0 = 2j * np.pi * 1.0 * const.mu_0
        eta_exact = -smu0 * vol * (1.0 / res)
        assert_allclose(vm.eta_x, eta_exact, rtol=1e-12)
        assert_allclose(vm.zeta, vol)  # mu_r = 1

    def test_eta_aliases(self):
        grid = make_grid()
        sfield = fields.get_source_field(
            grid, (5., 5., 5., 0., 0.), frequency=1.0)

        m_iso = models.Model(grid, 1.0)
        vm = models.VolumeModel(m_iso, sfield)
        assert vm.eta_y is vm.eta_x
        assert vm.eta_z is vm.eta_x

        m_vti = models.Model(grid, 1.0, property_z=2.0)
        vm = models.VolumeModel(m_vti, sfield)
        assert vm.eta_y is vm.eta_x
        assert vm.eta_z is not vm.eta_x

    def test_mu_r_and_epsilon(self):
        grid = make_grid()
        m = models.Model(grid, 1.0, mu_r=2.0, epsilon_r=1.0,
                         mapping='Conductivity')
        sfield = fields.get_source_field(
            grid, (5., 5., 5., 0., 0.), frequency=1.0)
        vm = models.VolumeModel(m, sfield)
        vol = grid.cell_volumes.reshape(grid.shape_cells, order='F')
        assert_allclose(vm.zeta, vol / 2.0)
        # eta includes the displacement term sigma + s*eps0*eps_r.
        smu0 = 2j * np.pi * const.mu_0
        s = 2j * np.pi
        eta_exact = -smu0 * vol * (1.0 + s * const.epsilon_0)
        assert_allclose(vm.eta_x, eta_exact, rtol=1e-12)

    def test_laplace(self):
        """Negative frequency: Laplace domain, real-valued eta."""
        grid = make_grid()
        m = models.Model(grid, 1.0, mapping='Conductivity')
        sfield = fields.get_source_field(
            grid, (5., 5., 5., 0., 0.), frequency=-2.0)
        vm = models.VolumeModel(m, sfield)
        assert not np.iscomplexobj(vm.eta_x)
        vol = grid.cell_volumes.reshape(grid.shape_cells, order='F')
        assert_allclose(vm.eta_x, -2.0 * const.mu_0 * vol, rtol=1e-12)


def test_expand_grid_model():
    grid = make_grid(4, 4, 4)
    m = models.Model(grid, 2.0, mapping='Resistivity')
    # Add sea (0.3) + air (1e8) above the model top (z=160).
    expanded = models.expand_grid_model(m, [0.3, 1e8], 200.0)
    assert expanded.shape[2] > m.shape[2]
    assert_allclose(expanded.property_x[..., -1], 1e8)
    assert_allclose(expanded.property_x[..., -2], 0.3)
    assert expanded.grid.nodes_z[-1] > 200.0
