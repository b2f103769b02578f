"""CLI tests (reference tests/test_cli.py): config parsing + batch runs."""

import os

import numpy as np
import pytest

import emg3d_tpu as e3
from emg3d_tpu import electrodes, meshes, surveys
from emg3d_tpu.cli import main as cli
from emg3d_tpu.cli import parser as cli_parser


def default_args():
    """args_dict as produced by the argparse front end."""
    return {
        'config': 'emg3d.cfg', 'nproc': None, 'forward': False,
        'misfit': False, 'gradient': False, 'path': None, 'survey': None,
        'model': None, 'output': None, 'save': None, 'load': None,
        'cache': None, 'clean': False, 'layered': None, 'dry_run': False,
        'verbosity': 0,
    }


def write_inputs(path, nx=16):
    """Survey + model files for a tiny fullspace run."""
    h = np.ones(nx) * 100.0
    grid = meshes.TensorMesh([h, h, h], origin=(-nx * 50.,) * 3)
    model = e3.Model(grid, property_x=1.0)

    src = electrodes.TxElectricDipole((0., 0., 0., 0., 0.))
    recs = [electrodes.RxElectricPoint((x, 50., 0., 0., 0.))
            for x in [250., 350.]]
    survey = surveys.Survey([src], recs, [1.0], relative_error=0.05)

    e3.save(os.path.join(path, 'survey.h5'), survey=survey, verb=0)
    e3.save(os.path.join(path, 'model.h5'), model=model, verb=0)


def write_cfg(path, extra=""):
    cfg = f"""[files]
path = {path}

[simulation]
name = CLI test

[solver_opts]
plain = True
tol = 1e-5
verb = 0
{extra}
"""
    fname = os.path.join(path, 'emg3d.cfg')
    with open(fname, 'w') as f:
        f.write(cfg)
    return fname


class TestParser:

    def test_defaults_no_config(self, tmp_path):
        args = default_args()
        args['config'] = '.'
        args['path'] = str(tmp_path)
        cfg, term = cli_parser.parse_config_file(args)
        assert term['function'] == 'forward'
        assert cfg['files']['survey'].endswith('survey.h5')
        assert cfg['files']['model'].endswith('model.h5')
        assert cfg['files']['output'].endswith('emg3d_out.h5')
        assert cfg['files']['log'].endswith('emg3d_out.log')
        assert not cfg['files']['save']

    def test_terminal_overrides(self, tmp_path):
        args = default_args()
        args.update(config='.', path=str(tmp_path), survey='ss',
                    model='mm.json', output='out.npz', gradient=True,
                    nproc=7, cache='c1')
        cfg, term = cli_parser.parse_config_file(args)
        assert term['function'] == 'gradient'
        assert cfg['files']['survey'].endswith('ss.h5')
        assert cfg['files']['model'].endswith('mm.json')
        assert cfg['files']['output'].endswith('out.npz')
        # cache sets save; load only once the file exists (resume).
        assert cfg['files']['save'].endswith('c1.h5')
        assert cfg['files']['load'] is False
        assert cfg['simulation_options']['max_workers'] == 7
        # gradient forces linear receiver interpolation.
        assert cfg['simulation_options'][
            'receiver_interpolation'] == 'linear'

    def test_config_sections(self, tmp_path):
        fname = write_cfg(str(tmp_path), extra="""
[gridding_opts]
frequency = 0.5
mapping = Conductivity
domain = -1000, 1000; -2000, 2000; None

[noise_opts]
add_noise = False

[data]
sources = TxED-1
remove_empty = False
""")
        args = default_args()
        args['config'] = fname
        cfg, term = cli_parser.parse_config_file(args)
        gopts = cfg['simulation_options']['gridding_opts']
        assert gopts['frequency'] == 0.5
        assert gopts['mapping'] == 'Conductivity'
        assert gopts['domain']['x'] == [-1000., 1000.]
        assert gopts['domain']['z'] is None
        assert cfg['noise_kwargs'] == {'add_noise': False}
        assert cfg['data']['sources'] == ['TxED-1']
        assert cfg['simulation_options']['solver_opts']['tol'] == 1e-5

    def test_shape_classes_values(self, tmp_path):
        for raw, expected in (("True", True), ("1.7", 1.7)):
            fname = os.path.join(str(tmp_path), 'sc.cfg')
            with open(fname, 'w') as f:
                f.write(f"[files]\npath = {tmp_path}\n"
                        f"[simulation]\nshape_classes = {raw}\n")
            args = default_args()
            args['config'] = fname
            cfg, _ = cli_parser.parse_config_file(args)
            assert cfg['simulation_options']['shape_classes'] == expected

    def test_unknown_keys_raise(self, tmp_path):
        fname = write_cfg(str(tmp_path), extra="\n[simulation]\nfoo = 1\n")
        # configparser rejects duplicate sections -> use solver_opts typo.
        fname = os.path.join(str(tmp_path), 'bad.cfg')
        with open(fname, 'w') as f:
            f.write("[solver_opts]\nnonsense = 1\n")
        args = default_args()
        args['config'] = fname
        with pytest.raises(TypeError, match='solver_opts'):
            cli_parser.parse_config_file(args)


class TestMain:

    def test_version(self, capsys):
        cli(['--version'])
        assert 'emg3d-tpu v' in capsys.readouterr().out

    def test_report(self, capsys):
        cli(['--report'])
        out = capsys.readouterr().out
        assert 'jax' in out

    def test_dry_run(self, tmp_path, capsys):
        path = str(tmp_path)
        write_inputs(path)
        fname = write_cfg(path)
        cli([fname, '--dry-run', '-g'])
        out = e3.load(os.path.join(path, 'emg3d_out.h5'), verb=0)
        assert np.all(out['data'] == 0.0)
        assert out['misfit'] == 0.0
        assert np.all(out['gradient'] == 0.0)
        assert os.path.isfile(os.path.join(path, 'emg3d_out.log'))

    def test_missing_files_exit(self, tmp_path):
        path = str(tmp_path)
        fname = write_cfg(path)
        with pytest.raises(SystemExit, match='not found'):
            cli([fname, '--dry-run'])

    def test_forward_run(self, tmp_path):
        path = str(tmp_path)
        write_inputs(path)
        fname = write_cfg(path, extra="\n[noise_opts]\nadd_noise = False\n")
        cli([fname, '-f', '--save', 'mysim'])

        out = e3.load(os.path.join(path, 'emg3d_out.h5'), verb=0)
        assert np.all(np.isfinite(out['data']))
        assert out['data'].shape == (1, 2, 1)

        # The saved simulation can be reloaded and has the data.
        sim = e3.Simulation.from_file(os.path.join(path, 'mysim.h5'))
        np.testing.assert_allclose(
            np.asarray(sim.data.observed), out['data'])

    def test_gradient_run_with_cache(self, tmp_path):
        path = str(tmp_path)
        write_inputs(path)
        fname = write_cfg(path, extra="\n[noise_opts]\nadd_noise = False\n")

        # Forward first, creating the cache.
        cli([fname, '-f', '--cache', 'cache'])

        # Observed exist now; misfit run from cache (no recompute).
        cli([fname, '-m', '--cache', 'cache'])
        out = e3.load(os.path.join(path, 'emg3d_out.h5'), verb=0)
        assert 'misfit' in out
        assert out['n_observations'] == 2
