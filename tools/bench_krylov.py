"""Krylov-variant shootout at production scale (decision-table row).

Runs the production configuration (MG-preconditioned Krylov + sc + lr,
reference defaults /root/reference emg3d/solver.py:52-449) with each of
the three native drivers — bicgstab / cgs / gcrotmk — in ONE process so
they share the line-smoother executables (the dominant cold cost; a
per-variant cold run would pay the ~25 min compile zoo three times).

Fills the "Krylov variant at production scale" CPU cell of
docs/decision-table.md and de-risks gcrotmk's per-Arnoldi-step host
scalars before a TPU window.

Env: BENCH_N (default 64), BENCH_WARM_REPS (default 2).
Run from /root/repo:  python - < tools/bench_krylov.py
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

N = int(os.environ.get("BENCH_N", "64"))
REPS = int(os.environ.get("BENCH_WARM_REPS", "2"))
RESULTS = pathlib.Path(__file__).with_name("bench_krylov_results.jsonl")


def emit(**kw):
    kw.update(n=N, platform=jax.default_backend(),
              date=datetime.date.today().isoformat(),
              peak_rss_gb=round(resource.getrusage(
                  resource.RUSAGE_SELF).ru_maxrss / 2**20, 2))
    line = json.dumps(kw)
    print(line, flush=True)
    with RESULTS.open("a") as f:
        f.write(line + "\n")


def main():
    from emg3d_tpu import fields, meshes, models, solver

    h = np.full(N, 50.0)
    grid = meshes.TensorMesh([h, h, h], origin=(-N * 25.0,) * 3)
    model = models.Model(grid, property_x=1.0)
    sfield = fields.get_source_field(
        grid, source=(0., 0., 0., 0., 0.), frequency=1.0)

    for variant in ("bicgstab", "cgs", "gcrotmk"):
        for tag in ("cold",) + ("warm",) * REPS:
            t0 = time.perf_counter()
            _, info = solver.solve(
                model, sfield, sslsolver=variant, semicoarsening=True,
                linerelaxation=True, tol=1e-6, maxit=50,
                return_info=True, verb=0)
            dt = time.perf_counter() - t0
            emit(metric=f"krylov_{variant}", tag=tag,
                 value=round(dt, 2), unit="s",
                 cells_per_s=round(N ** 3 / dt),
                 it_mg=info["it_mg"], it_ssl=info.get("it_ssl", 0),
                 exit=info["exit"], exit_message=info["exit_message"],
                 rel_error=float(info["rel_error"]))


if __name__ == "__main__":
    main()
