"""128-cube BASELINE-recipe scaling point on CPU (production f32+df64).

Cold (incl. compiles) and warm timings, JSON lines to stdout.
"""
import json
import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "0"

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

N = int(os.environ.get("BENCH_N", "128"))


def main():
    from emg3d_tpu import fields, meshes, models, solver

    h = np.full(N, 50.0)
    grid = meshes.TensorMesh([h, h, h], origin=(-N * 25.0,) * 3)
    model = models.Model(grid, property_x=1.0)
    sfield = fields.get_source_field(
        grid, source=(0., 0., 0., 0., 0.), frequency=1.0)

    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        efield, info = solver.solve(
            model, sfield, plain=True, cycle='F', tol=1e-6, maxit=50,
            return_info=True, verb=0)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"fullspace_{N}c_solve_to_1e-6_{tag}",
            "value": round(dt, 2), "unit": "s",
            "cells_per_s": round(N ** 3 / dt),
            "it_mg": info["it_mg"], "exit": info["exit"],
            "rel_error": float(info["rel_error"]),
            "platform": "cpu",
        }), flush=True)


if __name__ == "__main__":
    main()
