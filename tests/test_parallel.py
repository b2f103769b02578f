"""Tests for the task-execution layer (reference
tests/test_multiprocessing.py)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import emg3d_tpu as e3
from emg3d_tpu import electrodes, fields, meshes, models
from emg3d_tpu.parallel import tasks

# Compile-heavy suite (many per-shape executables on XLA:CPU):
# excluded from the quick tier, see CLAUDE.md.
pytestmark = pytest.mark.slow


def test_process_map_basics():
    count0 = tasks.process_map.count
    out = tasks.process_map(lambda x: x * 2, [1, 2, 3], max_workers=2,
                            disable=True)
    assert out == [2, 4, 6]
    assert tasks.process_map.count == count0 + 1


class TestSolveWorker:

    def setup_method(self):
        h = np.ones(16) * 100.0
        self.grid = meshes.TensorMesh([h, h, h], origin=(-800.,) * 3)
        self.model = models.Model(self.grid, property_x=1.0)
        self.sopts = {'plain': True, 'tol': 1e-4, 'verb': 0}

    def test_source_frequency_input(self):
        inp = {
            'model': self.model,
            'grid': self.grid,
            'source': electrodes.TxElectricDipole((0., 0., 0., 0., 0.)),
            'frequency': 1.0,
            'efield': None,
            'solver_opts': self.sopts,
        }
        efield, info = tasks.solve(inp)
        assert info['exit'] == 0
        assert np.all(np.isfinite(efield.field))

    def test_sfield_input_and_warm_start(self):
        sfield = fields.get_source_field(
            self.grid, (0., 0., 0., 0., 0.), 1.0)
        inp = {'model': self.model, 'sfield': sfield, 'efield': None,
               'solver_opts': self.sopts}
        efield, info = tasks.solve(inp)
        assert info['exit'] == 0

        # Warm start with the converged field: NOTHING DONE.
        inp['efield'] = efield
        efield2, info2 = tasks.solve(inp)
        assert info2['it_mg'] == 0

    def test_file_based(self, tmp_path):
        from emg3d_tpu import io
        sfield = fields.get_source_field(
            self.grid, (0., 0., 0., 0., 0.), 1.0)
        data = {'model': self.model, 'sfield': sfield, 'efield': None,
                'solver_opts': self.sopts}
        fname = str(tmp_path / 'task.h5')
        io.save(fname, data=data, verb=0)
        out_fname, _ = tasks.solve(fname)
        out = io.load(out_fname, verb=0)
        assert np.all(np.isfinite(out['efield'].field))
        assert out['info']['exit'] == 0

    def test_model_interpolation(self):
        """Model on a different grid gets interpolated to the task grid."""
        h = np.ones(8) * 200.0
        coarse = meshes.TensorMesh([h, h, h], origin=(-800.,) * 3)
        inp = {
            'model': self.model,   # 16³ model
            'grid': coarse,        # 8³ task grid
            'source': electrodes.TxElectricDipole((0., 0., 0., 0., 0.)),
            'frequency': 1.0,
            'efield': None,
            'solver_opts': self.sopts,
        }
        efield, info = tasks.solve(inp)
        assert efield.grid.shape_cells == (8, 8, 8)


class TestLayeredWorker:

    def test_forward_and_gradient(self):
        h = np.ones(8) * 200.0
        grid = meshes.TensorMesh([h, h, h], origin=(-800.,) * 3)
        model = models.Model(grid, property_x=1.0, mapping='Resistivity')
        src = electrodes.TxElectricDipole((0., 0., 0., 0., 0.))
        recs = {
            'RxEP-1': electrodes.RxElectricPoint((400., 0., 0., 0., 0.)),
            'RxEP-2': electrodes.RxElectricPoint((0., 500., 0., 0., 0.)),
        }
        freqs = {'f-1': 1.0}
        inp = {
            'model': model, 'src': src, 'receivers': recs,
            'frequencies': freqs, 'observed': None,
            'layered_opts': {'method': 'midpoint'}, 'gradient': False,
        }
        out = tasks.layered(inp)
        assert out.shape == (2, 1)
        assert np.all(np.isfinite(out))

        # Gradient without residual/weights: zeros.
        ginp = {**inp, 'gradient': True,
                'observed': np.ones((2, 1), dtype=complex)}
        g = tasks.layered(ginp)
        assert g.shape == (3, 8, 8, 8)
        assert np.all(g == 0.0)

        # Full gradient inputs.
        ginp['weights'] = np.ones((2, 1))
        ginp['residual'] = np.full((2, 1), 0.1 + 0.1j)
        g = tasks.layered(ginp)
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0
