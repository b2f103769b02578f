"""Tests for the native layered-earth engine (emg3d_tpu.layered).

Validation ladder:
1. Uniform medium == analytic fullspace (pins primary + conventions).
2. Electromagnetic reciprocity in a reflecting layered medium — a
   strong, non-circular check of the reflection/transmission-line
   machinery (swapped source/receiver exercise different kernel paths).
3. Cross-check against the 3-D multigrid solver on a two-halfspace
   model (the reference validates against empymod the same way,
   test_fields.py:408-438; here the roles are reversed).
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import alternatives
from emg3d_tpu import layered


class TestFullspace:

    def test_uniform_equals_fullspace(self):
        src = (0., 0., 0., 30., 0.)
        pts = np.array([[800., 100., -150.], [300., -500., 250.]])
        e, h = layered.fields_layered(
            src, pts, depth=[], res_h=[2.0], frequency=0.7)
        exact = alternatives.fullspace_dipole(
            pts, (0., 0., 0.), 0.7, 2.0, azimuth=30.)
        assert_allclose(e, exact, rtol=1e-6)

    def test_uniform_multilayer_equals_fullspace(self):
        """Interfaces with zero contrast: reflections vanish."""
        src = (0., 0., -500., 0., 0.)
        pts = np.array([[900., 200., -400.]])
        e1, h1 = layered.fields_layered(
            src, pts, depth=[], res_h=[1.0], frequency=1.0)
        # Same-layer constraint: interfaces away from src/rec layer.
        e2, h2 = layered.fields_layered(
            src, pts, depth=[-1000., 0.], res_h=[1.0, 1.0, 1.0],
            frequency=1.0)
        assert_allclose(e2, e1, rtol=1e-10)
        assert_allclose(h2, h1, rtol=1e-10)


class TestReflections:

    # Marine-ish configuration: sediment below 0, water above.
    depth = [0.]
    res = [1.0, 0.3]       # bottom (sediment), top (water)
    freq = 10.0

    def test_reciprocity(self):
        """E_x(r_b; src_a x-dir) == E_x(r_a; src_b x-dir).

        Both dipoles horizontal x-directed, different positions in the
        water layer: the Green tensor symmetry G_xx(a,b) = G_xx(b,a)
        must hold including all reflections.
        """
        a = np.array([0., 0., 60.])
        b = np.array([230., 140., 35.])

        e_ab, _ = layered.fields_layered(
            (*a, 0., 0.), b[None], self.depth, self.res, self.freq)
        e_ba, _ = layered.fields_layered(
            (*b, 0., 0.), a[None], self.depth, self.res, self.freq)
        assert_allclose(e_ab[0, 0], e_ba[0, 0], rtol=1e-8)

        # Cross-component: G_xy(a,b) = G_yx(b,a).
        e_ba_y, _ = layered.fields_layered(
            (*b, 90., 0.), a[None], self.depth, self.res, self.freq)
        assert_allclose(e_ab[0, 1], e_ba_y[0, 0], rtol=1e-8)

    def test_reflection_sensitivity(self):
        """Responses differ from the uniform fullspace (sanity)."""
        src = (0., 0., 60., 0., 0.)
        pts = np.array([[200., 0., 60.]])
        e_lay, _ = layered.fields_layered(
            src, pts, self.depth, self.res, self.freq)
        e_full, _ = layered.fields_layered(
            src, pts, [], [self.res[1]], self.freq)
        ratio = abs(e_lay[0, 0] / e_full[0, 0])
        assert abs(ratio - 1.0) > 0.05  # Interface clearly visible.

    def test_vti_lower_halfspace(self):
        """VTI in a non-source layer runs and differs from isotropic."""
        src = (0., 0., 60., 0., 0.)
        pts = np.array([[200., 0., 60.]])
        e_iso, _ = layered.fields_layered(
            src, pts, self.depth, self.res, self.freq)
        e_vti, _ = layered.fields_layered(
            src, pts, self.depth, self.res, self.freq,
            aniso=[2.0, 1.0])
        assert abs(e_vti[0, 0] / e_iso[0, 0] - 1.0) > 0.005

    def test_vti_source_layer_same_receiver(self):
        """Same-layer receivers in a VTI source layer use the
        closed-form VTI wholespace primary; reciprocity must hold."""
        s1 = (0., 0., 60., 25., 15.)
        s2 = (240., 130., 35., -50., 40.)
        aniso = [1.6, 2.0]       # VTI everywhere incl. source layer
        r1 = layered.dipole_layered(
            s1, [s2], self.depth, self.res, self.freq, aniso=aniso)[0]
        r2 = layered.dipole_layered(
            s2, [s1], self.depth, self.res, self.freq, aniso=aniso)[0]
        np.testing.assert_allclose(r1, r2, rtol=1e-8)


class TestVTIFullspace:
    """Closed-form VTI wholespace primary (layered._vti_fullspace_*)."""

    zeta = 1j * 2 * np.pi * 0.8 * (4e-7 * np.pi)

    def test_sommerfeld_identities_vs_dlf(self):
        """Each tabulated Hankel integral equals its DLF evaluation."""
        from emg3d_tpu import transforms
        filt = transforms.design_hankel_filter()
        gam = np.sqrt(self.zeta * 0.5)
        rho, h = 400.0, 250.0
        lam = filt.base / rho
        gg = np.sqrt(lam ** 2 + gam ** 2)
        ker = np.exp(-gg * h)
        tab = layered._sommerfeld_table(gam, rho, h)
        j0 = lambda f: (f / rho) @ filt.j0
        j1 = lambda f: (f / rho) @ filt.j1
        checks = {
            'i1': j0(lam / gg * ker), 'i2': j0(lam * ker),
            'i3': j0(lam * gg * ker), 'i4': j1(ker / gg),
            'i5': j1(ker), 'i6': j1(gg * ker),
            'i7': j1(lam ** 2 / gg * ker), 'i8': j1(lam ** 2 * ker),
            'i9': j0(lam ** 3 / gg * ker),
        }
        for key, dlf in checks.items():
            np.testing.assert_allclose(tab[key], dlf, rtol=1e-7,
                                       err_msg=key)

    def test_isotropic_limit(self):
        from emg3d_tpu.electrodes import rotation
        rng = np.random.default_rng(3)
        rvec = rng.uniform(-800, 800, (6, 3))
        for azm, elv in [(0., 0.), (30., 40.), (0., 90.)]:
            p = rotation(azm, elv)
            e1, h1 = layered._fullspace_primary(rvec, p, 0.5, self.zeta)
            e2, h2 = layered._vti_fullspace_primary(
                rvec, p, 0.5, 0.5, self.zeta)
            np.testing.assert_allclose(e2, e1, rtol=1e-12)
            np.testing.assert_allclose(h2, h1, rtol=1e-12)

    def test_vti_vs_spectral(self):
        """Closed form == spectral TL totals in a uniform VTI stack."""
        from emg3d_tpu.electrodes import rotation
        depth = [-1000., -500., 0.]
        res = [2.0] * 4
        aniso = [1.7] * 4
        recs = np.array([[600., 100., -1200.], [700., 300., -250.],
                         [900., -100., 200.]])
        eta_h = 0.5
        eta_v = eta_h / 1.7 ** 2
        for azm, elv in [(0., 0.), (30., 40.), (0., 90.)]:
            src = (0., 0., -750., azm, elv)
            e_sp, h_sp = layered.fields_layered(
                src, recs, depth, res, 0.8, aniso=aniso)
            rv = recs - np.array(src[:3])[None]
            e_cf, h_cf = layered._vti_fullspace_primary(
                rv, rotation(azm, elv), eta_h, eta_v, self.zeta)
            np.testing.assert_allclose(e_sp, e_cf, rtol=2e-6)
            np.testing.assert_allclose(h_sp, h_cf, rtol=2e-6)


class TestCrossLayerAndVertical:
    """Cross-layer transmission and vertical/tilted sources.

    Oracles: (1) a uniform stack must reproduce the analytic fullspace
    for receivers in ANY layer and ANY source orientation (validates
    the transmission walk and the VED series-voltage source);
    (2) electromagnetic reciprocity in a strongly reflecting VTI stack
    (exact for the true solution, sensitive to every sign and
    transmission factor).
    """

    depth = [-1000., -500., 0.]

    def test_uniform_stack_equals_fullspace_everywhere(self):
        res = [2., 2., 2., 2.]
        recs = np.array([
            [600., 100., -1200.],    # two layers below the source
            [700., 300., -250.],     # one layer above
            [900., -100., 200.],     # two layers above (top halfspace)
            [800., 150., -700.],     # same layer
        ])
        for azm, elv in [(0., 0.), (30., 40.), (0., 90.), (90., 0.)]:
            src = (0., 0., -750., azm, elv)
            e, h = layered.fields_layered(
                src, recs, self.depth, res, 1.0)
            exact = alternatives.fullspace_dipole(
                recs, (0., 0., -750.), 1.0, 2.0, azimuth=azm,
                elevation=elv)
            assert_allclose(e, exact, rtol=1e-6)

    def test_reciprocity_layered_vti(self):
        res = [5., 1., 0.3, 1e8]
        aniso = [2., 1.5, 1., 1.]
        cases = [
            # HED <-> tilted, across one interface
            ((0., 0., -750., 25., 10.), (800., 300., -250., -40., 0.)),
            # VED <-> VED across two interfaces
            ((0., 0., -750., 0., 90.), (900., 200., -1200., 0., 90.)),
            # HED <-> VED across layers
            ((0., 0., -250., 0., 0.), (700., -400., -1500., 0., 90.)),
            # tilted <-> tilted
            ((0., 0., -100., 55., 30.), (600., 500., -800., 10., -45.)),
        ]
        for s1, s2 in cases:
            r1 = layered.dipole_layered(
                s1, [s2], self.depth, res, 0.7, aniso=aniso)[0]
            r2 = layered.dipole_layered(
                s2, [s1], self.depth, res, 0.7, aniso=aniso)[0]
            assert_allclose(r1, r2, rtol=1e-10)

    def test_magnetic_reciprocity(self):
        """H(r2; J at r1) == -E(r1; M at r2)-type symmetry is implicit;
        here: uniform stack H equals the analytic fullspace H."""
        res = [1., 1., 1., 1.]
        src = (0., 0., -750., 30., 40.)
        recs = np.array([[600., 100., -1200.], [700., 300., -250.]])
        from emg3d_tpu.electrodes import rotation
        from scipy import constants as const
        e, h = layered.fields_layered(src, recs, self.depth, res, 1.0)
        zeta = 2j * np.pi * 1.0 * const.mu_0
        rvec = recs - np.array([0., 0., -750.])[None]
        e_ref, h_ref = layered._fullspace_primary(
            rvec, rotation(30., 40.), 1.0, zeta)
        assert_allclose(h, h_ref, rtol=1e-5)


class TestVs3DSolver:

    @pytest.mark.slow
    def test_two_halfspace_vs_3d(self):
        """1-D engine vs 3-D multigrid on a two-halfspace model."""
        import emg3d_tpu as e3
        from emg3d_tpu import meshes, models, solver, fields

        freq = 10.0
        h = np.ones(48) * 20.0
        grid = meshes.TensorMesh([h, h, h], origin=(-480., -480., -480.))
        res3d = np.ones(grid.shape_cells)
        res3d[:, :, 24:] = 0.3          # water above z=0
        model = models.Model(grid, property_x=res3d,
                             mapping='Resistivity')

        src = (0., 0., 50., 0., 0.)
        efield = solver.solve_source(
            model, src, freq, plain=True, tol=1e-6, verb=0)

        rec_x = [150., 210., 270.]
        rec = ([float(x) for x in rec_x], [30.] * 3, [50.] * 3, 0, 0)
        resp3d = fields.get_receiver(efield, rec, method='cubic')

        pts = np.array([[x, 30., 50.] for x in rec_x])
        e1d, _ = layered.fields_layered(
            src, pts, depth=[0.], res_h=[1.0, 0.3], frequency=freq)

        assert_allclose(np.asarray(resp3d), e1d[:, 0], rtol=0.1)
