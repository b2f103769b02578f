"""TPU measurement pass: run during a healthy tunnel window.

Collects, in increasing cost order (so a window that closes mid-run
still yields the cheap numbers):

1. dispatch overhead (tiny kernel round trip),
2. per-kernel timings at BENCH sizes (GS phase, line phase thomas/pcr,
   df64 residual, restrict/prolong),
3. full solve wall times (plain F-cycles to 1e-6) per size.

Writes one JSON line per measurement to ``--out`` (default
/tmp/tpu_profile.jsonl) so partial runs are still useful.

Usage:  python - < tools/tpu_profile.py        (from /root/repo)
   or:  python tools/tpu_profile.py  (with cwd importable)
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_ENABLE_X64", "0")

OUT = os.environ.get("TPU_PROFILE_OUT", "/tmp/tpu_profile.jsonl")
SIZES = [int(s) for s in os.environ.get(
    "TPU_PROFILE_SIZES", "32,48,64,96,128").split(",")]


def emit(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def timed(fn, *args, n=10):
    """Median wall time of fn(*args) with block_until_ready."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)          # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from emg3d_tpu import backend

    backend.reexec_if_born_bad()
    backend.enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from emg3d_tpu import fields, meshes, models, solver
    from emg3d_tpu.ops import smoothers

    emit(metric="device", value=str(jax.devices()[0]))

    # 1. dispatch overhead.
    x = jnp.ones(8)
    f = jax.jit(lambda a: a + 1.0)
    emit(metric="dispatch_roundtrip_s", value=timed(f, x, n=30))

    for n in SIZES:
        try:
            h = np.full(n, 50.0)
            grid = meshes.TensorMesh([h, h, h], origin=(-n * 25.0,) * 3)
            model = models.Model(grid, property_x=1.0)
            sfield = fields.get_source_field(
                grid, source=(0., 0., 0., 0., 0.), frequency=1.0)
            vmodel = models.VolumeModel(model, sfield)
            meta, arrays = solver._build_hierarchy(vmodel, 0, 0, 1)
            arrs = arrays[0]
            s = solver._field_to_dev(sfield)
            e = tuple(jnp.zeros_like(c) for c in s)

            t = timed(solver._gs_phase_jit, e, s, arrs, (0, 0, 0), n=5)
            emit(metric="gs_phase_s", size=n, value=t,
                 cells_per_s=round(n ** 3 / 8 / t))

            for solver_kind in ("thomas", "pcr"):
                os.environ["EMG3D_TPU_LINE_SOLVER"] = solver_kind
                jax.clear_caches()
                t = timed(solver._line_phase_jit, e, s, arrs, (0, 0), 0,
                          n=5)
                emit(metric=f"line_phase_{solver_kind}_s", size=n,
                     value=t, lines_per_s=round(n * n / 4 / t))
            os.environ.pop("EMG3D_TPU_LINE_SOLVER", None)
            jax.clear_caches()

            t = timed(lambda: solver._residual_norm_split_jit(
                e, e, s, arrs)[1], n=5)
            emit(metric="df64_residual_s", size=n, value=t,
                 cells_per_s=round(n ** 3 / t))

            # Mosaic-compiled whole-phase Pallas kernel vs the XLA
            # phase (VMEM-resident v1 — expect failures above the
            # VMEM-feasible size; that failure bound is itself the
            # profile result that sizes the tiled variant).
            try:
                from emg3d_tpu.ops import pallas_gs
                P = (arrs["eta_x"], arrs["eta_y"], arrs["eta_z"],
                     arrs["zeta"], arrs["hx"], arrs["hy"], arrs["hz"])
                pal = jax.jit(lambda e_, s_: pallas_gs.
                              gauss_seidel_phase_pallas(
                                  *e_, *s_, *P, 0, 0, 0))
                t = timed(pal, e, s, n=5)
                emit(metric="gs_phase_pallas_s", size=n, value=t,
                     cells_per_s=round(n ** 3 / 8 / t))
            except Exception as exc:
                emit(metric="gs_phase_pallas_error", size=n,
                     error=str(exc)[:200])
        except Exception as exc:
            emit(metric="kernel_block_error", size=n,
                 error=str(exc)[:200])

    # 3. full solves.
    for n in SIZES:
        try:
            h = np.full(n, 50.0)
            grid = meshes.TensorMesh([h, h, h], origin=(-n * 25.0,) * 3)
            model = models.Model(grid, property_x=1.0)
            sfield = fields.get_source_field(
                grid, source=(0., 0., 0., 0., 0.), frequency=1.0)
            t0 = time.perf_counter()
            efield, info = solver.solve(
                model, sfield, plain=True, cycle='F', tol=1e-6,
                maxit=50, return_info=True, verb=0)
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            efield, info = solver.solve(
                model, sfield, plain=True, cycle='F', tol=1e-6,
                maxit=50, return_info=True, verb=0)
            warm = time.perf_counter() - t0
            emit(metric="solve_plain_F", size=n, cold_s=round(cold, 3),
                 warm_s=round(warm, 3), it_mg=info["it_mg"],
                 cells_per_s=round(n ** 3 / warm),
                 rel_error=float(info["rel_error"]),
                 exit=info["exit_message"])
        except Exception as exc:
            emit(metric="solve_error", size=n, error=str(exc)[:200])


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:
        emit(metric="fatal", error=str(exc)[:300])
        sys.exit(1)
