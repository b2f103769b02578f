"""Tests for the native Survey container (reference tests/test_surveys.py)."""

import numpy as np
import pytest

from emg3d_tpu import electrodes, surveys
from emg3d_tpu.surveys import Survey, DataArray


def make_survey(**kwargs):
    sources = surveys.txrx_coordinates_to_dict(
        electrodes.TxElectricDipole,
        ([-100., 100.], 0., 0., 0., 0.))
    receivers = surveys.txrx_coordinates_to_dict(
        electrodes.RxElectricPoint,
        ([200., 300., 400.], 50., 0., 0., 0.))
    return Survey(sources, receivers, frequencies=[1.0, 2.0], **kwargs)


class TestDataArray:

    def test_basic(self):
        coords = (('s1', 's2'), ('r1',), ('f1', 'f2', 'f3'))
        da = DataArray(np.zeros((2, 1, 3), dtype=complex), coords)
        assert da.shape == (2, 1, 3)
        assert da.size == 6
        da.loc['s2', 'r1', 'f3'] = 5 + 1j
        assert da.data[1, 0, 2] == 5 + 1j
        assert da.loc['s2', :, :].shape == (1, 3)

    def test_arithmetic(self):
        coords = (('s1',), ('r1', 'r2'), ('f1',))
        a = DataArray(np.full((1, 2, 1), 2.0), coords)
        b = DataArray(np.full((1, 2, 1), 3.0), coords)
        assert np.all((a + b).data == 5.0)
        assert np.all((a - b).data == -1.0)
        assert np.all((a * b).data == 6.0)
        assert np.all((b / a).data == 1.5)
        assert np.all((a ** -2).data == 0.25)
        assert np.all(abs(-a).data == 2.0)

    def test_sel(self):
        coords = (('s1', 's2'), ('r1', 'r2'), ('f1', 'f2'))
        da = DataArray(np.arange(8.).reshape(2, 2, 2), coords)
        sub = da.sel(src=['s2'], freq=['f1'])
        assert sub.shape == (1, 2, 1)
        assert sub.data[0, 0, 0] == 4.0
        assert sub.coords[0] == ('s2',)


class TestSurvey:

    def test_basics(self):
        srv = make_survey(name='test')
        assert srv.shape == (2, 3, 2)
        assert srv.size == 12
        assert srv.count == 0  # All NaN initially.
        assert 'TxED-1' in srv.sources
        assert 'RxEP-2' in srv.receivers
        assert srv.frequencies['f-1'] == 1.0
        assert 'test' in srv.__repr__()
        assert np.all(np.isnan(srv.data.observed.data))

    def test_kwargs_raise(self):
        with pytest.raises(TypeError, match='Unexpected '):
            make_survey(unknown=True)

    def test_data_input(self):
        data = np.full((2, 3, 2), 1 + 1j)
        srv = make_survey(data=data)
        assert srv.count == 12
        assert np.all(srv.data.observed.data == 1 + 1j)

        srv2 = make_survey(data={'mydata': data})
        assert 'mydata' in srv2.data
        assert np.all(np.isnan(srv2.data.observed.data))

    def test_standard_deviation(self):
        srv = make_survey(data=np.full((2, 3, 2), 3. + 4j))
        assert srv.standard_deviation is None

        srv.noise_floor = 0.1
        np.testing.assert_allclose(srv.standard_deviation.data, 0.1)

        srv.relative_error = 0.5
        # std = sqrt(nf² + (re·|d|)²); |d| = 5.
        np.testing.assert_allclose(
            srv.standard_deviation.data, np.sqrt(0.01 + 6.25))

        # Directly-set std takes priority.
        srv.standard_deviation = np.full((2, 3, 2), 2.0)
        np.testing.assert_allclose(srv.standard_deviation.data, 2.0)
        srv.standard_deviation = None
        np.testing.assert_allclose(
            srv.standard_deviation.data, np.sqrt(0.01 + 6.25))

        with pytest.raises(ValueError, match='bigger than zero'):
            srv.noise_floor = -1.0
        with pytest.raises(ValueError, match='bigger than zero'):
            srv.standard_deviation = np.zeros((2, 3, 2))

    def test_nf_re_arrays(self):
        srv = make_survey(data=np.ones((2, 3, 2)))
        srv.relative_error = np.full((2, 3, 2), 0.05)
        assert isinstance(srv.relative_error, np.ndarray)
        assert '_relative_error' in srv.data

    def test_add_noise(self):
        srv = make_survey(data=np.full((2, 3, 2), 1e-10 + 1e-10j))
        srv.noise_floor = 1e-15
        srv.relative_error = 0.05
        srv.add_noise(min_amplitude=None)
        assert np.all(np.isfinite(srv.data.observed.data))
        # Noise changed the data.
        assert not np.all(srv.data.observed.data == 1e-10 + 1e-10j)

        # min_amplitude cuts low-signal data.
        srv2 = make_survey(data=np.full((2, 3, 2), 1e-20 + 0j))
        srv2.noise_floor = 1e-15
        srv2.add_noise()
        assert np.all(np.isnan(srv2.data.observed.data))

        # min_offset cuts close receivers.
        srv3 = make_survey(data=np.full((2, 3, 2), 1.0 + 0j))
        srv3.noise_floor = 1e-15
        srv3.add_noise(min_offset=150.0, min_amplitude=None)
        # TxED-2 at x=100, RxEP-1 at x=200: offset ~112 m < 150 -> NaN.
        assert np.all(np.isnan(srv3.data.observed.loc['TxED-2', 'RxEP-1']))
        assert np.all(np.isfinite(srv3.data.observed.loc['TxED-1',
                                                         'RxEP-3']))

    def test_select(self):
        data = np.random.default_rng(42).random((2, 3, 2))
        srv = make_survey(data=data + 0j)
        sub = srv.select(sources='TxED-1', frequencies=['f-2'])
        assert sub.shape == (1, 3, 1)
        np.testing.assert_allclose(
            sub.data.observed.data[0, :, 0], data[0, :, 1])

    def test_select_remove_empty(self):
        data = np.full((2, 3, 2), np.nan + 1j * np.nan)
        data[0, 0, 0] = 1.0
        srv = make_survey(data=data)
        sub = srv.select()
        assert sub.shape == (1, 1, 1)

    def test_dict_roundtrip(self):
        srv = make_survey(noise_floor=1e-15, relative_error=0.05,
                          name='rt', info='some info')
        d = srv.to_dict()
        srv2 = Survey.from_dict(d)
        assert srv2.name == 'rt'
        assert srv2.shape == srv.shape
        assert srv2.noise_floor == 1e-15
        assert srv2.sources['TxED-1'] == srv.sources['TxED-1']
        cp = srv.copy()
        assert cp.shape == srv.shape

    def test_coordinates(self):
        srv = make_survey()
        np.testing.assert_allclose(
            srv.source_coordinates()[0], [-100., 100.])
        np.testing.assert_allclose(
            srv.receiver_coordinates()[0], [200., 300., 400.])

    def test_relative_receivers(self):
        sources = [electrodes.TxElectricDipole((x, 0, 0, 0, 0))
                   for x in [0., 1000.]]
        rec = electrodes.RxElectricPoint((500., 0, 0, 0, 0), relative=True)
        srv = Survey(sources, [rec], frequencies=1.0)
        coords = srv.receiver_coordinates()
        np.testing.assert_allclose(coords[0], [500., 1500.])
        coords1 = srv.receiver_coordinates('TxED-2')
        np.testing.assert_allclose(coords1[0], [1500.])

    def test_isfinite(self):
        data = np.full((2, 3, 2), np.nan + 1j * np.nan)
        data[1, 2, 0] = 9.0
        srv = make_survey(data=data)
        assert srv.isfinite.sum() == 1
        np.testing.assert_allclose(srv.finite_data(), [9.0])


def test_random_noise():
    std = np.full((4, 5, 6), 2.0)
    for ntype in ['white_noise', 'gaussian_correlated',
                  'gaussian_uncorrelated']:
        noise = surveys.random_noise(std, ntype=ntype)
        assert noise.shape == std.shape
        assert np.iscomplexobj(noise)
    # white noise has constant amplitude = std.
    noise = surveys.random_noise(std, ntype='white_noise')
    np.testing.assert_allclose(np.abs(noise), 2.0)


def test_txrx_helpers():
    d = surveys.txrx_coordinates_to_dict(
        electrodes.TxElectricDipole,
        (np.arange(1, 6) * 2000., 0, 0, 0, 0), strength=100.)
    assert len(d) == 5
    assert d['TxED-3'].strength == 100.
    assert d['TxED-3'].center[0] == 6000.

    # Mixed lists/dicts flatten.
    electric = [electrodes.RxElectricPoint((x, 0, 0, 0, 0))
                for x in [1000, 1100]]
    magnetic = surveys.txrx_coordinates_to_dict(
        electrodes.RxMagneticPoint, ([950, 1050], 0, 0, 0, 90))
    out = surveys.txrx_lists_to_dict([electric, magnetic])
    assert len(out) == 4

    # Dict passes through.
    assert surveys.txrx_lists_to_dict(magnetic) is magnetic


def test_frequencies_to_dict():
    f = surveys.frequencies_to_dict([1.0, 10.0])
    assert f == {'f-1': 1.0, 'f-2': 10.0}
    with pytest.raises(ValueError, match='non-unique'):
        surveys.frequencies_to_dict([1.0, 1.0])
    d = {'low': 0.1}
    assert surveys.frequencies_to_dict(d) is d
