"""North-star benchmark: salt-body CSEM survey with adjoint gradient.

The BASELINE north-star metric: solve a SEG/EAGE-salt-class model
(~2 M cells) to 1e-6 faster than the reference's numba-CPU, and scale
a 64-source survey near-linearly over a device mesh.  This driver
builds a synthetic salt-class model (smoothly varying sediment
background, high-resistivity salt body with rough top), runs a
multi-source survey forward + misfit + adjoint gradient, and reports
wall times as JSON lines.

Environment knobs:
  SALT_N          grid cells per axis        (default 128)
  SALT_SOURCES    number of x-dipole sources (default 8)
  SALT_TINY=1     4-source 32-cell smoke configuration (CPU-runnable)
  SALT_BATCH=1    use the device-mesh batched Simulation mode
  SALT_PLAIN=1    plain F-cycles instead of the production config
                  (CPU-affordable: skips the line-smoother compiles)
  SALT_SKIP_WARM=1  skip the warm repeat of the full survey forward
                  (at the 2 M-cell / 64-source target scale the repeat
                  costs ~45 min on the 1-core CPU host; sources 2..n of
                  the cold pass already run warm, so per-source
                  steady-state throughput is still measurable)

Run from the repository root:  python tools/salt_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(
    __file__)), ".."))

import numpy as np


def emit(**kw):
    kw["ts"] = time.time()
    print(json.dumps(kw), flush=True)


def salt_model(grid, seed=20):
    """Synthetic salt-class resistivity model on ``grid``.

    Sediments: resistivity increasing with depth (0.5 -> ~2 Ohm.m) with
    smooth lateral variation; sea water above z = 0; a salt body
    (30-100 Ohm.m) with a rough top between -1500 and -3000 m.
    """
    import emg3d_tpu as emg3d

    rng = np.random.default_rng(seed)
    xc, yc, zc = (grid.cell_centers_x, grid.cell_centers_y,
                  grid.cell_centers_z)
    X, Y, Z = np.meshgrid(xc, yc, zc, indexing="ij")

    # Depth-dependent sediments with smooth lateral perturbation.
    res = 0.5 * np.exp(-Z / 2500.0)
    for _ in range(4):
        kx, ky = rng.uniform(0.2e-3, 1e-3, 2)
        ph1, ph2 = rng.uniform(0, 2 * np.pi, 2)
        res *= 1.0 + 0.2 * np.sin(kx * X + ph1) * np.cos(ky * Y + ph2)

    # Salt body: ellipsoid with a rough top surface.
    cx, cy, cz = 0.0, 0.0, -2600.0
    ax_, ay_, az_ = 2600.0, 2100.0, 900.0
    rough = 1.0 + 0.25 * np.sin(2.2e-3 * X + 0.7) * np.sin(
        1.7e-3 * Y + 1.9)
    inside = ((X - cx) ** 2 / ax_ ** 2 + (Y - cy) ** 2 / ay_ ** 2
              + (Z - cz) ** 2 / (az_ * rough) ** 2) < 1.0
    res[inside] = rng.uniform(30.0, 100.0)

    # Sea water.
    res[Z > 0] = 0.3

    return emg3d.Model(grid, property_x=res, mapping="Resistivity")


def main():
    from emg3d_tpu import backend

    tiny = bool(os.environ.get("SALT_TINY"))
    force_cpu = tiny or bool(os.environ.get("SALT_CPU"))
    if force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        backend.reexec_if_born_bad()

    import emg3d_tpu as emg3d

    backend.enable_compilation_cache()

    n = int(os.environ.get("SALT_N", "32" if tiny else "128"))
    nsrc = int(os.environ.get("SALT_SOURCES", "4" if tiny else "8"))
    freq = 1.0

    width = 8000.0 / n
    h = np.full(n, width)
    grid = emg3d.TensorMesh([h, h, h], origin=(-4000.0, -4000.0, -7200.0))
    model = salt_model(grid)
    import jax
    emit(metric="setup", cells=grid.n_cells, sources=nsrc,
         platform=jax.default_backend())

    xs = np.linspace(-3000.0, 3000.0, nsrc)
    survey = emg3d.Survey(
        sources=[emg3d.electrodes.TxElectricPoint((x, 0, -30, 0, 0))
                 for x in xs],
        receivers=[emg3d.electrodes.RxElectricPoint((x, y, -100, 0, 0))
                   for x in np.linspace(-3500, 3500, 12)
                   for y in (-500.0, 500.0)],
        frequencies=freq, noise_floor=1e-16, relative_error=0.03)

    kw = {}
    if os.environ.get("SALT_BATCH"):
        kw["parallel"] = "batch"
    sopts = {"tol": 1e-6}
    if os.environ.get("SALT_PLAIN"):
        sopts["plain"] = True
    sim = emg3d.Simulation(
        survey=survey, model=model, gridding="same", verb=-1,
        receiver_interpolation="linear",
        solver_opts=sopts, **kw)

    t0 = time.perf_counter()
    sim.compute(observed=True)
    t_fwd = time.perf_counter() - t0
    emit(metric="forward_survey_s", value=round(t_fwd, 2),
         per_source_s=round(t_fwd / nsrc, 2),
         cells_per_s=round(grid.n_cells * nsrc / t_fwd))

    # Warm pass: drop the fields, keep the compiled executables —
    # the steady-state survey throughput (what a production fleet
    # iterating over models sees).
    if not os.environ.get("SALT_SKIP_WARM"):
        sim.clean('computed')
        t0 = time.perf_counter()
        sim.compute(observed=True)
        t_warm = time.perf_counter() - t0
        emit(metric="forward_survey_warm_s", value=round(t_warm, 2),
             per_source_s=round(t_warm / nsrc, 2),
             cells_per_s=round(grid.n_cells * nsrc / t_warm))

    t0 = time.perf_counter()
    misfit = float(sim.misfit)
    grad = sim.gradient
    t_grad = time.perf_counter() - t0
    emit(metric="misfit_gradient_s", value=round(t_grad, 2),
         misfit=misfit, grad_max=float(np.max(np.abs(grad))),
         finite=bool(np.all(np.isfinite(grad))))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:
        emit(metric="fatal", error=f"{type(exc).__name__}: {exc}"[:300])
        sys.exit(1)
