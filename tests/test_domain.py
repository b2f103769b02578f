"""Domain-decomposed (grid-sharded) solves on the 8-device CPU mesh.

Validates that a solve whose grid is sharded over a 2-D device mesh
(parallel.domain) produces the same fields as the single-device solve:
GSPMD must insert correct halo exchanges for every multigrid level op.
"""

import numpy as np
import pytest

import jax

from emg3d_tpu import fields, meshes, models, solver
from emg3d_tpu.parallel import domain

# Compile-heavy suite (many per-shape executables on XLA:CPU):
# excluded from the quick tier, see CLAUDE.md.
pytestmark = pytest.mark.slow


def _problem(n=16, stretched=False, anisotropic=False):
    if stretched:
        h = [np.full(n, 40.0), np.full(n, 55.0),
             40.0 * 1.06 ** np.arange(n)]
    else:
        h = [np.full(n, 40.0)] * 3
    grid = meshes.TensorMesh(h, origin=(-n * 20.0,) * 3)
    if anisotropic:
        rng = np.random.default_rng(11)
        model = models.Model(
            grid, property_x=rng.uniform(0.5, 2.0, grid.n_cells),
            property_y=rng.uniform(0.5, 2.0, grid.n_cells),
            property_z=rng.uniform(0.5, 2.0, grid.n_cells))
    else:
        model = models.Model(grid, property_x=1.0)
    sfield = fields.get_source_field(
        grid, source=(0., 0., 0., 0., 0.), frequency=0.9)
    return model, sfield


def test_make_grid_mesh_factorization():
    mesh = domain.make_grid_mesh(8)
    assert mesh.devices.shape in [(4, 2), (2, 4)]
    mesh = domain.make_grid_mesh(4)
    assert mesh.devices.shape == (2, 2)
    mesh = domain.make_grid_mesh(2)
    assert sorted(mesh.devices.shape) == [1, 2]


def test_placement_plan_levels():
    mesh = domain.make_grid_mesh(8)   # (4, 2)
    plc = domain.GridPlacement(mesh, min_local=4)
    # 32^3: 32/4 = 8 >= 4 and 32/2 = 16 >= 4 -> sharded.
    sh = plc.spec((32, 32, 32))
    assert sh.spec != ()
    # 8^3: 8/4 = 2 < 4 -> replicated.
    rep = plc.spec((8, 8, 8))
    assert rep.spec == ()


@pytest.mark.parametrize("case", ["plain", "sclr", "bicgstab"])
def test_sharded_solve_matches_single(case):
    """Grid-sharded solve == single-device solve (same numerics)."""
    model, sfield = _problem(16, stretched=(case == "sclr"),
                             anisotropic=(case != "plain"))
    mesh = domain.make_grid_mesh(8)

    kw = dict(tol=5e-5, maxit=30, verb=0, return_info=True)
    if case == "plain":
        kw.update(plain=True)
    elif case == "sclr":
        kw.update(sslsolver=False, semicoarsening=True, linerelaxation=1)
    else:
        kw.update(sslsolver='bicgstab', semicoarsening=False,
                  linerelaxation=False)

    e_ref, info_ref = solver.solve(model, sfield, **kw)
    e_sh, info_sh = solver.solve(model, sfield, mesh=mesh, **kw)

    assert info_ref["exit_message"] == "CONVERGED"
    assert info_sh["exit_message"] == "CONVERGED"
    # Same iteration counts: sharding must not change the algorithm.
    assert info_sh["it_mg"] == info_ref["it_mg"]
    nrm = np.linalg.norm(e_ref.field)
    assert np.linalg.norm(e_sh.field - e_ref.field) / nrm < 1e-10


def test_sharded_field_actually_sharded():
    """The level-0 arrays really live distributed across devices."""
    model, sfield = _problem(16)
    mesh = domain.make_grid_mesh(8)
    plc = domain.GridPlacement(mesh)
    vmodel = models.VolumeModel(model, sfield)
    meta, arrays = solver._build_hierarchy(vmodel, 0, 0, 2, placement=plc)
    eta = arrays[0]["eta_x"]
    assert len(eta.sharding.device_set) == 8
    # Coarsest level (4^3 with min_local=4 on a (4,2) mesh) replicated.
    eta_c = arrays[-1]["eta_x"]
    assert eta_c.sharding.spec == () or eta_c.sharding.is_fully_replicated
