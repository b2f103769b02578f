"""Tests for property mappings and interpolation (ref tests/test_maps.py)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from emg3d_tpu import maps, meshes

MAP_NAMES = ['Conductivity', 'LgConductivity', 'LnConductivity',
             'Resistivity', 'LgResistivity', 'LnResistivity']


class TestMaps:

    @pytest.mark.parametrize('name', MAP_NAMES)
    def test_forward_backward_roundtrip(self, name):
        pmap = getattr(maps, 'Map' + name)()
        sigma = np.array([1e-3, 0.5, 1.0, 3.3, 1e2])
        assert_allclose(pmap.backward(pmap.forward(sigma)), sigma,
                        rtol=1e-12)

    @pytest.mark.parametrize('name', MAP_NAMES)
    def test_derivative_chain_vs_numeric(self, name):
        """gradient_m = gradient_sigma * dsigma/dm at the mapped value."""
        pmap = getattr(maps, 'Map' + name)()
        sigma = np.array([0.5, 1.0, 3.3])
        m = pmap.forward(sigma)

        eps = 1e-7
        dsig_dm = (pmap.backward(m + eps) - pmap.backward(m - eps)) / (
            2 * eps)

        grad = np.ones_like(m)
        pmap.derivative_chain(grad, m)
        assert_allclose(grad, dsig_dm, rtol=1e-6)

    def test_repr(self):
        assert 'conductivity' in repr(maps.MapLgConductivity())

    def test_register_map(self):
        @maps.register_map
        class MapSquare(maps.BaseMap):
            def __init__(self):
                super().__init__('square of conductivity')

            def forward(self, conductivity):
                return conductivity ** 2

            def backward(self, mapped):
                return np.sqrt(mapped)

            def derivative_chain(self, gradient, mapped):
                gradient /= 2 * np.sqrt(mapped)

        assert 'MapSquare' in maps.MAPLIST
        assert_allclose(maps.MAPLIST['MapSquare']().backward(4.0), 2.0)


class TestInterpolate:

    def setup_method(self):
        self.grid = meshes.BaseMesh(
            [np.ones(8) * 50., np.ones(6) * 100., np.ones(4) * 200.],
            origin=(0., 0., 0.))
        cx = self.grid.cell_centers_x[:, None, None]
        cy = self.grid.cell_centers_y[None, :, None]
        cz = self.grid.cell_centers_z[None, None, :]
        # A smooth trilinear function is reproduced exactly by 'linear'.
        self.values = 1.0 + 2e-3 * cx + 1e-3 * cy - 5e-4 * cz + 0 * cz

    @pytest.mark.parametrize('method', ['nearest', 'linear', 'cubic'])
    def test_points_methods(self, method):
        xi = np.array([[120., 260., 350.], [333., 133., 633.]])
        out = maps.interpolate(self.grid, self.values, xi, method=method)
        exact = 1.0 + 2e-3 * xi[:, 0] + 1e-3 * xi[:, 1] - 5e-4 * xi[:, 2]
        rtol = {'nearest': 0.15, 'linear': 1e-10, 'cubic': 1e-2}[method]
        assert_allclose(out, exact, rtol=rtol)

    def test_grid_to_grid_volume(self):
        """Conservative regridding preserves the total integral."""
        new_grid = meshes.BaseMesh(
            [np.ones(5) * 80., np.ones(3) * 200., np.ones(2) * 400.],
            origin=(0., 0., 0.))
        out = maps.interpolate(self.grid, self.values, new_grid,
                               method='volume')
        vol_o = self.grid.cell_volumes.reshape(
            self.grid.shape_cells, order='F')
        vol_n = new_grid.cell_volumes.reshape(
            new_grid.shape_cells, order='F')
        assert_allclose((out * vol_n).sum(), (self.values * vol_o).sum(),
                        rtol=1e-12)

    def test_log_option(self):
        xi = np.array([[120., 260., 350.]])
        lin = maps.interpolate(self.grid, self.values, xi, method='linear')
        log = maps.interpolate(self.grid, self.values, xi, method='linear',
                               log=True)
        # Smooth positive field: log-interp close to but not equal linear.
        assert abs(lin - log) / lin < 1e-2
        assert lin != log

    def test_extrapolate_option(self):
        xi = np.array([[-100., 300., 400.]])
        out_t = maps.interpolate(self.grid, self.values, xi,
                                 method='linear', extrapolate=True)
        assert np.isfinite(out_t).all()
        out_f = maps.interpolate(self.grid, self.values, xi,
                                 method='nearest', extrapolate=False)
        assert np.isfinite(out_f).all()  # nearest clamps


class TestVolumeAverageKernels:

    def test_weights(self):
        x_i = np.array([0., 1., 2.])
        x_o = np.array([0.5, 1.5])
        w, ixi, ixo = maps._volume_average_weights(x_i, x_o)
        assert_allclose(w.sum(), 1.0)  # Output length covered.

    def test_interp_volume_average_conserves(self):
        rng = np.random.default_rng(0)
        nx_i = (np.array([0.]), np.cumsum(rng.uniform(1, 2, 5)))
        nodes_i = [np.r_[0, np.cumsum(rng.uniform(1, 2, n))]
                   for n in (5, 4, 3)]
        nodes_o = [np.r_[v[0], v[0] + np.cumsum(
            rng.uniform(0.5, 1.5, 4))] for v in nodes_i]
        # Restrict output nodes into input range (conservation only holds
        # where volumes overlap).
        nodes_o = [np.clip(v, nodes_i[i][0], nodes_i[i][-1])
                   for i, v in enumerate(nodes_o)]

        vals = rng.random((5, 4, 3))
        new_vals = np.zeros((4, 4, 4))
        vol_n = np.einsum('i,j,k->ijk', *[np.diff(v) for v in nodes_o])
        vol_n[vol_n == 0] = 1.0
        maps.interp_volume_average(
            *nodes_i, vals, *nodes_o, new_vals, vol_n)

        vol_i = np.einsum('i,j,k->ijk', *[np.diff(v) for v in nodes_i])
        # Integral over the output domain equals integral of input over
        # the same (sub-)domain when output ⊆ input: check via indicator.
        assert new_vals.max() <= vals.max() + 1e-12
        assert new_vals.min() >= vals.min() - 1e-12

    def test_edges_to_vol_averages(self):
        grid = meshes.BaseMesh([np.ones(3), np.ones(3), np.ones(3)],
                               origin=(0., 0., 0.))
        ex = np.ones(grid.shape_edges_x)
        ey = np.ones(grid.shape_edges_y)
        ez = np.ones(grid.shape_edges_z)
        vol = grid.cell_volumes.reshape(grid.shape_cells, order='F')
        ox, oy, oz = (np.zeros(grid.shape_cells) for _ in range(3))
        maps.interp_edges_to_vol_averages(ex, ey, ez, vol, ox, oy, oz)
        # Constant unit field: each cell gets 4 * 1/4 * V = V.
        assert_allclose(ox, vol)
        assert_allclose(oy, vol)
        assert_allclose(oz, vol)


class TestEllipseIndices:

    def test_circle(self):
        x = np.linspace(-2, 2, 41)
        coo = (x, x)
        mask = maps.ellipse_indices(coo, (0., 0.), (0., 0.), radius=1.0)
        xx, yy = np.meshgrid(x, x, indexing='ij')
        exact = xx ** 2 + yy ** 2 <= 1.0
        assert (mask == exact).mean() > 0.98

    def test_elongated(self):
        x = np.linspace(-3, 3, 61)
        mask = maps.ellipse_indices((x, x), (-1., 0.), (1., 0.),
                                    radius=0.5)
        xx, yy = np.meshgrid(x, x, indexing='ij')
        # Points near the two foci must be inside.
        assert mask[np.argmin(abs(x + 1)), np.argmin(abs(x))]
        assert mask[np.argmin(abs(x - 1)), np.argmin(abs(x))]
        # Far away points outside.
        assert not mask[0, 0]
