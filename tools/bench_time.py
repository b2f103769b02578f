"""North-star config 5 (BASELINE.json): time-domain EM via Fourier-DLF.

Transient switch-off response of a 1 Ohm.m fullspace from 3-D
frequency-domain solves at the Fourier-required frequencies
(reference workflow: emg3d/time.py Fourier + one solve per frequency;
here all solves share one grid/hierarchy, so every frequency past the
first reuses the compiled executables).  Validated against the
closed-form transient (tests/alternatives.fullspace_dipole_time) at a
900 m inline offset, so the row is a *correct* end-to-end number, not
just a timing.

Emits JSON lines and appends to ``tools/bench_time_results.jsonl``.

Env: BENCH_N (default 64), BENCH_FMIN/FMAX (default 1e-3/1e2).
Run from /root/repo:  python - < tools/bench_time.py
"""
import datetime
import json
import os
import pathlib
import time as _time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402

N = int(os.environ.get("BENCH_N", "64"))
RESULTS = pathlib.Path(__file__).with_name("bench_time_results.jsonl")


def emit(**kw):
    kw.update(n=N, platform=jax.default_backend(),
              date=datetime.date.today().isoformat())
    line = json.dumps(kw)
    print(line, flush=True)
    with RESULTS.open("a") as f:
        f.write(line + "\n")


def main():
    import sys

    import emg3d_tpu as emg3d

    times = np.logspace(-2, 1, 13)
    offset = 900.0
    res = 1.0

    fourier = emg3d.Fourier(
        time=times, fmin=float(os.environ.get("BENCH_FMIN", "1e-3")),
        fmax=float(os.environ.get("BENCH_FMAX", "1e2")), signal=-1)
    freqs = np.asarray(fourier.freq_compute)

    # One cubic grid sized for the mid-band skin depth; all
    # frequencies share it (and its compiled hierarchy).  Boundaries
    # ~4 skin depths out at 1 Hz keep the 900 m receiver clean.
    h = np.full(N, 100.0)
    grid = emg3d.TensorMesh([h, h, h], origin=(-N * 50.0,) * 3)
    model = emg3d.Model(grid, property_x=res)

    t0 = _time.perf_counter()
    fresp = []
    for i, f in enumerate(freqs):
        efield = emg3d.solve_source(
            model, (0., 0., 0., 0., 0.), f, plain=True, cycle='F',
            tol=1e-6, maxit=50, verb=-1)
        fresp.append(complex(emg3d.fields.get_receiver(
            efield, (offset, 0., 0., 0., 0.))))
        if i == 0:
            t_first = _time.perf_counter() - t0
    t_all = _time.perf_counter() - t0
    fresp = np.array(fresp)

    tresp = np.asarray(fourier.freq2time(fresp, offset)).ravel()

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent
                           / "tests"))
    import alternatives
    exact = alternatives.fullspace_dipole_time(
        np.array([[offset, 0., 0.]]), (0., 0., 0.), times, res,
        signal=-1)[:, 0, 0]
    err = np.abs(tresp - exact) / np.abs(exact)
    # Late times are boundary/band-limited; grade the DLF band core.
    core = slice(1, 10)

    emit(metric="transient_fullspace", nfreq=len(freqs),
         value=round(t_all, 2), unit="s",
         first_solve_s=round(t_first, 2),
         warm_per_freq_s=round((t_all - t_first) / max(len(freqs) - 1,
                                                       1), 2),
         max_rel_err_core=round(float(err[core].max()), 4),
         median_rel_err=round(float(np.median(err)), 4),
         ok=bool(err[core].max() < 0.15))


if __name__ == "__main__":
    main()
