"""Tests for electrodes (reference tests/test_electrodes.py)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from emg3d_tpu import electrodes


class TestWireAndPoint:

    def test_point(self):
        p = electrodes.TxElectricPoint((100., 200., -300., 30., 60.))
        assert p.xtype == 'electric'
        assert_allclose(p.center, [100., 200., -300.])
        assert p.azimuth == 30.0
        assert p.elevation == 60.0
        assert p.strength == 1.0
        assert 'TxElectricPoint' in repr(p)

    def test_point_needs_5(self):
        with pytest.raises(ValueError, match='azimuth'):
            electrodes.TxElectricPoint((0., 0., 0.))

    def test_equality(self):
        p1 = electrodes.TxElectricPoint((0., 0., 0., 0., 0.))
        p2 = electrodes.TxElectricPoint((0., 0., 0., 0., 0.))
        p3 = electrodes.TxElectricPoint((0., 0., 0., 90., 0.))
        assert p1 == p2
        assert p1 != p3
        assert p1 != 'not an electrode'

    def test_dict_roundtrip(self):
        p = electrodes.TxMagneticPoint((1., 2., 3., 15., 75.))
        d = p.to_dict()
        assert d['__class__'] == 'TxMagneticPoint'
        p2 = electrodes.TxMagneticPoint.from_dict(d)
        assert p == p2
        assert p.copy() == p


class TestDipole:

    def test_flat_format(self):
        # (x1, x2, y1, y2, z1, z2)
        d = electrodes.TxElectricDipole((-50., 50., 0., 0., 0., 0.))
        assert_allclose(d.center, [0., 0., 0.])
        assert_allclose(d.length, 100.0)
        assert d.azimuth == 0.0
        assert d.elevation == 0.0

    def test_point_format(self):
        # (x, y, z, azimuth, elevation) + length
        d = electrodes.TxElectricDipole((0., 0., 0., 90., 0.), length=50.)
        assert_allclose(d.length, 50.0)
        assert d.azimuth == 90.0
        assert_allclose(d.points,
                        [[0., -25., 0.], [0., 25., 0.]], atol=1e-12)

    def test_points_format(self):
        pts = np.array([[-50., 0., 0.], [50., 0., 0.]])
        d = electrodes.TxElectricDipole(pts)
        assert_allclose(d.points, pts)
        assert_allclose(d.length, 100.0)

    def test_formats_agree(self):
        d1 = electrodes.TxElectricDipole((-50., 50., 0., 0., 0., 0.))
        d2 = electrodes.TxElectricDipole((0., 0., 0., 0., 0.), length=100.)
        d3 = electrodes.TxElectricDipole(
            np.array([[-50., 0., 0.], [50., 0., 0.]]))
        assert_allclose(d1.points, d2.points, atol=1e-12)
        assert_allclose(d1.points, d3.points, atol=1e-12)
        assert_allclose(d1.length, d2.length)

    def test_zero_length_raises(self):
        with pytest.raises(ValueError, match='identical'):
            electrodes.TxElectricDipole((0., 0., 0., 0., 0., 0.))

    def test_strength(self):
        d = electrodes.TxElectricDipole((0., 0., 0., 0., 0.), strength=7.5)
        assert d.strength == 7.5


class TestWireSource:

    def test_wire(self):
        pts = np.array([[0., 0., 0.], [100., 0., 0.], [100., 100., 0.]])
        w = electrodes.TxElectricWire(pts)
        assert w.segment_n == 2
        assert_allclose(w.segment_lengths, [100., 100.])
        assert_allclose(w.length, 200.)
        assert_allclose(w.center, pts.mean(0))


class TestReceivers:

    def test_electric_point(self):
        r = electrodes.RxElectricPoint((1000., 0., -200., 0., 0.))
        assert r.xtype == 'electric'
        assert not r.relative
        assert r.data_type == 'complex'
        assert r._adjoint_source is electrodes.TxElectricPoint

    def test_magnetic_point(self):
        r = electrodes.RxMagneticPoint((0., 0., 0., 90., 0.))
        assert r.xtype == 'magnetic'
        assert r._adjoint_source is electrodes.TxMagneticPoint

    def test_relative(self):
        src = electrodes.TxElectricDipole((1000., 0., 0., 0., 0.))
        r = electrodes.RxElectricPoint((500., 0., 0., 0., 0.),
                                       relative=True)
        assert_allclose(r.center_abs(src), [1500., 0., 0.])
        assert_allclose(r.coordinates_abs(src)[:3], [1500., 0., 0.])


class TestGeometryHelpers:

    def test_rotation(self):
        assert_allclose(electrodes.rotation(0, 0), [1, 0, 0], atol=1e-14)
        assert_allclose(electrodes.rotation(90, 0), [0, 1, 0], atol=1e-14)
        assert_allclose(electrodes.rotation(0, 90), [0, 0, 1], atol=1e-14)
        assert_allclose(electrodes.rotation(180, 0), [-1, 0, 0],
                        atol=1e-14)
        # Radians path.
        assert_allclose(electrodes.rotation(np.pi / 2, 0, deg=False),
                        [0, 1, 0], atol=1e-14)

    def test_point_to_dipole_roundtrip(self):
        point = np.array([10., -20., 30., 35., 55.])
        dip = electrodes.point_to_dipole(point, length=111.)
        azm, elv, length = electrodes.dipole_to_point(dip)
        assert_allclose([azm, elv, length], [35., 55., 111.])
        assert_allclose(dip.mean(0), point[:3])

    def test_point_to_square_loop(self):
        src = np.array([0., 0., 0., 0., 0.])
        loop = electrodes.point_to_square_loop(src, area=8.0)
        assert loop.shape == (5, 3)
        # Closed.
        assert_allclose(loop[0], loop[-1])
        # Perpendicular to an x-directed dipole: all x = 0.
        assert_allclose(loop[:, 0], 0.0, atol=1e-12)
        # Side length = sqrt(area): diagonal half = sqrt(area/2)*sqrt(2).
        side = np.linalg.norm(loop[1] - loop[0])
        assert_allclose(side ** 2, 8.0)
