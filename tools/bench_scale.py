"""BASELINE-recipe scaling points on CPU (production f32+df64).

Cold (incl. compiles) and warm timings.  Each measurement is printed
as a JSON line AND appended to ``tools/bench_scale_results.jsonl``
(committed): ``bench.py`` embeds the best recorded warm point as its
``"headline"`` field, so the driver's BENCH artifact carries the
round's actual scaling claim even when the driver-run size is capped
(e.g. the CPU fallback caps at 48³).

Env knobs:

- ``BENCH_N``: cube size (default 128).
- ``BENCH_CONFIG``: ``plain`` (default; the reference's published
  recipe, stand-alone F-cycles — BASELINE.md) or ``production`` (the
  solver default: MG-preconditioned BiCGSTAB + semicoarsening + line
  relaxation).  Both solve the same fullspace problem to the same
  tolerance, so either is comparable against the reference's published
  time-to-solution (the published curve is the plain recipe,
  /root/reference docs/dev/tests.rst:185-250).
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

N = int(os.environ.get("BENCH_N", "128"))
CONFIG = os.environ.get("BENCH_CONFIG", "plain")
RESULTS = pathlib.Path(__file__).with_name("bench_scale_results.jsonl")

# Reference published runtimes for the same problem to the same
# tolerance (BASELINE.md; docs/_static/CPU.png).
REF_SECONDS = {32: 1.3, 48: 4.0, 64: 10.5, 96: 37.0, 128: 90.0,
               192: 320.0, 256: 780.0, 384: 2700.0}


def main():
    from emg3d_tpu import fields, meshes, models, solver

    h = np.full(N, 50.0)
    grid = meshes.TensorMesh([h, h, h], origin=(-N * 25.0,) * 3)
    model = models.Model(grid, property_x=1.0)
    sfield = fields.get_source_field(
        grid, source=(0., 0., 0., 0., 0.), frequency=1.0)

    kw = dict(tol=1e-6, maxit=50, return_info=True, verb=0)
    if CONFIG == "production":
        # BENCH_SSL picks the Krylov driver (bicgstab/cgs/gcrotmk) for
        # the decision-table row "Krylov variant at production scale".
        ssl = os.environ.get("BENCH_SSL", "bicgstab")
        kw.update(sslsolver=ssl if ssl != "bicgstab" else True,
                  semicoarsening=True, linerelaxation=True)
    else:
        kw.update(plain=True, cycle='F')

    ref = REF_SECONDS.get(N)
    reps = int(os.environ.get("BENCH_WARM_REPS", "1"))
    for tag in ("cold",) + ("warm",) * reps:
        t0 = time.perf_counter()
        efield, info = solver.solve(model, sfield, **kw)
        dt = time.perf_counter() - t0
        rec = {
            "metric": f"fullspace_{N}c_solve_to_1e-6_{tag}",
            "n": N, "tag": tag, "config": CONFIG,
            **({"ssl": os.environ["BENCH_SSL"]}
               if os.environ.get("BENCH_SSL") else {}),
            "value": round(dt, 2), "unit": "s",
            "cells_per_s": round(N ** 3 / dt),
            "vs_baseline": round(ref / dt, 2) if ref else None,
            "it_mg": info["it_mg"], "it_ssl": info.get("it_ssl", 0),
            "exit": info["exit"],
            "rel_error": float(info["rel_error"]),
            "platform": jax.default_backend(),
            "smoother": os.environ.get("EMG3D_TPU_SMOOTHER", "auto"),
            "peak_rss_gb": round(resource.getrusage(
                resource.RUSAGE_SELF).ru_maxrss / 2**20, 2),
            "date": datetime.date.today().isoformat(),
        }
        print(json.dumps(rec), flush=True)
        with RESULTS.open("a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
