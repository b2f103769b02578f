"""North-star configs 2-3 (BASELINE.json): marine + triaxial headlines.

The published reference curve covers only the plain recipe (BASELINE.md);
configs 2-3 are the regimes semicoarsening/line-relaxation and the
MG-preconditioned BiCGSTAB exist for (reference defaults,
/root/reference emg3d/solver.py:52-449; >90% of reference runtime is
smoothing there, docs/dev/tests.rst:113-119).  No published reference
number exists for them, so each record carries the problem spec and the
same-tolerance plain-recipe throughput as context.

- ``marine``: layered marine model (air/sea/sediments + resistive
  target) on a vertically stretched grid, x-dipole just above the
  seafloor, 1 Hz; sc+lr stand-alone F-cycles (config 2: the stretched-
  grid regime where plain cycles stall).
- ``triaxial``: fullspace with triaxial anisotropy
  (rho_y = 2 rho_x, rho_z = 5 rho_x); solver DEFAULT (MG-preconditioned
  BiCGSTAB + sc + lr) (config 3).

Env: BENCH_CASE (marine|triaxial, default both), BENCH_N (lateral size,
default 128 for marine / 64 for triaxial), BENCH_WARM_REPS (default 2).
Run from /root/repo:  python - < tools/bench_northstar.py
"""
import datetime
import json
import os
import pathlib
import resource
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "0"

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

RESULTS = pathlib.Path(__file__).with_name("bench_northstar_results.jsonl")
REPS = int(os.environ.get("BENCH_WARM_REPS", "2"))


def emit(**kw):
    kw.update(platform=jax.default_backend(),
              date=datetime.date.today().isoformat(),
              peak_rss_gb=round(resource.getrusage(
                  resource.RUSAGE_SELF).ru_maxrss / 2**20, 2))
    line = json.dumps(kw)
    print(line, flush=True)
    with RESULTS.open("a") as f:
        f.write(line + "\n")


def marine_problem(n):
    """Layered marine model on a vertically stretched grid.

    n x n laterally (100 m cells), n/2 cells vertically: uniform 25 m
    through the water column and geometrically stretched (factor 1.05)
    below the seafloor — the grid class that makes plain cycles stall
    and sc+lr worth their cost.
    """
    from emg3d_tpu import fields, meshes, models

    nz = n // 2
    hx = np.full(n, 100.0)
    # Water column: top third; sediments: stretched below.
    nwater = nz // 3
    hz_water = np.full(nwater, 25.0)
    hz_sed = 25.0 * 1.05 ** np.arange(1, nz - nwater + 1)
    hz = np.concatenate([hz_sed[::-1], hz_water])  # z up: deep -> sea
    origin = (-n * 50.0, -n * 50.0, -float(np.sum(hz_sed)))
    grid = meshes.TensorMesh([hx, hx, hz], origin=origin)

    # Properties by cell-center depth: sea 0.3, sediments 1 + depth
    # gradient, resistive target (50 Ohm.m) mid-sediment.
    zc = grid.cell_centers_z
    rho = np.ones((n, n, nz))
    rho[:, :, zc > 0] = 0.3
    sed = zc <= 0
    rho[:, :, sed] = 1.0 + 0.002 * (-zc[sed])
    ztarget = (zc < -800) & (zc > -1100)
    rho[n // 4:3 * n // 4, n // 4:3 * n // 4, ztarget] = 50.0
    model = models.Model(grid, property_x=rho)

    sfield = fields.get_source_field(
        grid, source=(0., 0., 30., 0., 0.), frequency=1.0)
    return grid, model, sfield


def triaxial_problem(n):
    from emg3d_tpu import fields, meshes, models

    h = np.full(n, 50.0)
    grid = meshes.TensorMesh([h, h, h], origin=(-n * 25.0,) * 3)
    model = models.Model(grid, property_x=1.0, property_y=2.0,
                         property_z=5.0)
    sfield = fields.get_source_field(
        grid, source=(0., 0., 0., 0., 0.), frequency=1.0)
    return grid, model, sfield


def run(case, n):
    from emg3d_tpu import solver

    if case == "marine":
        grid, model, sfield = marine_problem(n)
        kw = dict(sslsolver=False, semicoarsening=True,
                  linerelaxation=True, cycle='F')
    else:
        grid, model, sfield = triaxial_problem(n)
        kw = dict(sslsolver=True, semicoarsening=True, linerelaxation=True)
    ncells = int(np.prod(grid.shape_cells))

    for tag in ("cold",) + ("warm",) * REPS:
        t0 = time.perf_counter()
        efield, info = solver.solve(model, sfield, tol=1e-6, maxit=90,
                                    return_info=True, verb=0, **kw)
        dt = time.perf_counter() - t0
        emit(metric=f"northstar_{case}", n=n, tag=tag,
             shape=list(grid.shape_cells), ncells=ncells,
             value=round(dt, 2), unit="s",
             cells_per_s=round(ncells / dt),
             it_mg=info["it_mg"], it_ssl=info.get("it_ssl", 0),
             exit=info["exit"], exit_message=info["exit_message"],
             rel_error=float(info["rel_error"]),
             smoother=os.environ.get("EMG3D_TPU_SMOOTHER", "auto"))


def main():
    cases = os.environ.get("BENCH_CASE", "marine,triaxial").split(",")
    for case in cases:
        n = int(os.environ.get("BENCH_N",
                               "128" if case == "marine" else "64"))
        run(case.strip(), n)


if __name__ == "__main__":
    main()
