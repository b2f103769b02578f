"""Generate frozen regression data for the solver test suite.

Mirrors the reference's fixture strategy (tests/create_data/
regression.py): a homogeneous VTI fullspace solved with F/W/V cycles and
BiCGSTAB, a random heterogeneous model with semicoarsening/line-
relaxation cycling, and a Laplace-domain case.  Run from the repo root:

    python tests/create_data/regression.py

Writes tests/data/regression.npz.  Regenerate ONLY when a numerics
change is intended; the test suite asserts close equality against it.
"""

import os
import sys

# Same XLA environment as tests/conftest.py: the compilation cache keys
# include the device count, so this must match for cache sharing.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
# No persistent compilation cache: jax 0.9/XLA:CPU executable
# (de)serialization segfaults intermittently (see tests/conftest.py).

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from emg3d_tpu import fields, meshes, models, solver  # noqa: E402


def vti_fullspace():
    """VTI fullspace on a small stretched grid; F/W/V + BiCGSTAB."""
    hx = np.ones(16) * 200.
    hy = np.ones(16) * 300.
    hz = np.r_[np.ones(8) * 100., np.ones(8) * 200.]
    grid = meshes.TensorMesh([hx, hy, hz], origin=(-1600., -2400., -1200.))
    model = models.Model(grid, property_x=1.5, property_z=3.0,
                         mapping='Resistivity')
    sfield = fields.get_source_field(grid, (0., 0., 0., 0., 0.), 0.77)

    out = {}
    for cycle in ['F', 'W', 'V']:
        efield, info = solver.solve(
            model, sfield, plain=True, cycle=cycle, tol=1e-6,
            return_info=True, verb=0)
        out[f'vti_{cycle}_field'] = efield.field
        out[f'vti_{cycle}_it'] = info['it_mg']

    efield, info = solver.solve(
        model, sfield, sslsolver='bicgstab', semicoarsening=False,
        linerelaxation=False, cycle='F', tol=1e-6, return_info=True,
        verb=0)
    out['vti_bicgstab_field'] = efield.field
    out['vti_bicgstab_it'] = info['it_ssl']
    return out


def heterogeneous_sclr():
    """Random heterogeneous model: sc-cycling and lr-cycling cases.

    Two separate cases (sc=123 with point smoothing; lr=456 on a single
    hierarchy) instead of the full product — same code-path coverage at
    a fraction of the XLA compile surface.
    """
    rng = np.random.default_rng(2026)
    hx = np.ones(16) * 150.
    grid = meshes.TensorMesh([hx, hx, hx], origin=(-1200.,) * 3)
    prop = 10 ** rng.uniform(-1, 1, grid.shape_cells)
    model = models.Model(grid, property_x=prop, mapping='Resistivity')
    sfield = fields.get_source_field(grid, (0., 0., 0., 20., 5.), 1.33)

    out = {'het_prop': prop}

    efield, info = solver.solve(
        model, sfield, sslsolver=False, semicoarsening=123,
        linerelaxation=False, cycle='F', tol=1e-6, return_info=True,
        verb=0)
    out['het_sc_field'] = efield.field
    out['het_sc_it'] = info['it_mg']

    efield, info = solver.solve(
        model, sfield, sslsolver=False, semicoarsening=False,
        linerelaxation=456, cycle='F', tol=1e-6, return_info=True, verb=0)
    out['het_lr_field'] = efield.field
    out['het_lr_it'] = info['it_mg']
    return out


def laplace_case():
    """Laplace-domain (negative frequency) solve: all-real arithmetic."""
    hx = np.ones(16) * 200.
    grid = meshes.TensorMesh([hx, hx, hx], origin=(-1600.,) * 3)
    model = models.Model(grid, property_x=2.0, mapping='Resistivity')
    sfield = fields.get_source_field(grid, (0., 0., 0., 0., 0.), -1.5)

    efield, info = solver.solve(
        model, sfield, plain=True, cycle='F', tol=1e-6, return_info=True,
        verb=0)
    return {
        'lap_field': efield.field,
        'lap_it': info['it_mg'],
    }


CASES = {'vti': vti_fullspace, 'het': heterogeneous_sclr,
         'lap': laplace_case}


if __name__ == '__main__':
    # Each case runs in its OWN process (python regression.py <case>):
    # XLA:CPU JIT'd executables consume mmap regions; generating
    # everything in one process exhausts vm.max_map_count ("LLVM
    # compilation error: Cannot allocate memory").  Partial results are
    # merged into regression.npz.
    fname = os.path.join(os.path.dirname(__file__), '..', 'data',
                         'regression.npz')

    if len(sys.argv) > 1:
        case = sys.argv[1]
        data = {}
        if os.path.isfile(fname):
            data.update(np.load(fname))
        data.update(CASES[case]())
        np.savez_compressed(fname, **data)
        print(f"[{case}] merged into {os.path.abspath(fname)}")
    else:
        import subprocess
        if os.path.isfile(fname):
            os.unlink(fname)
        for case in CASES:
            subprocess.run([sys.executable, __file__, case], check=True)
        data = dict(np.load(fname))
        print(f"Written {os.path.abspath(fname)}")
        for k, v in data.items():
            v = np.asarray(v)
            print(f"  {k}: shape={v.shape} dtype={v.dtype}")
