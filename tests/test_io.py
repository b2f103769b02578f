"""Tests for save/load/convert across h5/npz/json (ref tests/test_io.py)."""

import os

import numpy as np
import pytest
from numpy.testing import assert_allclose

import emg3d_tpu as e3
from emg3d_tpu import electrodes, fields, io, meshes, models, surveys


def make_stuff():
    grid = meshes.TensorMesh(
        [np.ones(4) * 10., np.ones(3) * 20., np.ones(2) * 40.],
        origin=(0., 0., 0.))
    model = models.Model(grid, 2.0, property_z=3.0, mapping='Resistivity')
    field = fields.Field(grid, frequency=1.0)
    field.fx[...] = 1 + 2j
    src = electrodes.TxElectricDipole((5., 5., 5., 0., 0.))
    survey = surveys.Survey(
        [src], [electrodes.RxElectricPoint((30., 30., 40., 0., 0.))],
        frequencies=[1.0], noise_floor=1e-15)
    return grid, model, field, survey


@pytest.mark.parametrize('ext', ['h5', 'npz', 'json'])
class TestRoundtrip:

    def test_classes(self, ext, tmp_path):
        grid, model, field, survey = make_stuff()
        fname = str(tmp_path / f'out.{ext}')
        io.save(fname, grid=grid, model=model, field=field, survey=survey,
                verb=0)
        out = io.load(fname, verb=0)
        assert out['grid'] == grid
        assert out['model'] == model
        assert out['field'] == field
        assert out['survey'].shape == survey.shape
        assert out['survey'].sources['TxED-1'] == src_of(survey)

    def test_arrays_and_nested(self, ext, tmp_path):
        fname = str(tmp_path / f'data.{ext}')
        data = {
            'a': np.arange(10.),
            'b': np.ones((2, 3), dtype=np.complex128) * (1 + 1j),
            'nested': {'x': 1.5, 'name': 'hello', 'arr': np.eye(3)},
            'intval': 7,
        }
        io.save(fname, **data, verb=0)
        out = io.load(fname, verb=0)
        assert_allclose(out['a'], data['a'])
        assert_allclose(out['b'], data['b'])
        assert_allclose(out['nested']['arr'], np.eye(3))
        assert float(out['nested']['x']) == 1.5
        assert str(out['nested']['name']) == 'hello'


def src_of(survey):
    return list(survey.sources.values())[0]


class TestMisc:

    def test_unknown_extension(self, tmp_path):
        with pytest.raises(ValueError, match="extension"):
            io.save(str(tmp_path / 'data.abc'), a=1)
        with pytest.raises(ValueError, match="extension"):
            io.load(str(tmp_path / 'data.abc'))

    def test_verb_info_strings(self, tmp_path):
        fname = str(tmp_path / 'x.npz')
        info = io.save(fname, a=np.ones(3), verb=-1)
        assert 'saved' in info.lower()
        out, info = io.load(fname, verb=-1)
        assert 'loaded' in info.lower()
        assert_allclose(out['a'], 1.0)

    def test_convert(self, tmp_path):
        grid, model, field, survey = make_stuff()
        out = io.convert(model.to_dict(), 'Model')
        assert out == model

        fname = str(tmp_path / 'm.npz')
        io.save(fname, model=model, verb=0)
        # Convert from file content.
        out2 = io.convert(fname, 'Model')
        assert out2['model'] == model

    def test_top_level_exports(self, tmp_path):
        assert e3.save is io.save
        assert e3.load is io.load
        assert e3.convert is io.convert
