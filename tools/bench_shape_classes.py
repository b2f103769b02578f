"""Cold-start cost of a multi-shape survey, with/without shape classes.

A ``gridding='frequency'`` survey compiles one multigrid hierarchy per
DISTINCT grid shape (XLA executables are keyed by shape; cell widths are
traced).  ``Simulation(shape_classes=...)`` snaps the automatically
constructed grids onto shared shape classes (meshes.snap_shapes +
pad_mesh_cells), trading a bounded number of padded buffer cells for a
bounded executable count.  This tool measures both sides of that trade
on one survey:

- distinct grid shapes (= compiled hierarchy count),
- total cells across tasks (the padding overhead),
- cold wall time of ``Simulation.compute()`` in a FRESH process
  (compile + solve; the dominant term on first use),
- warm wall time (re-solve in the same process: pure solve).

Each configuration runs in a subprocess so compile caches cannot leak
between them.  Emits one JSON line per configuration to stdout and
appends to ``tools/bench_shape_classes_results.jsonl``.

Env: BENCH_NFREQ (default 6), BENCH_GROWTH (default 1.7).
Run from /root/repo:  python tools/bench_shape_classes.py
"""
import datetime
import json
import os
import pathlib
import subprocess
import sys

RESULTS = pathlib.Path(__file__).with_name("bench_shape_classes_results.jsonl")

_CHILD = r'''
import json, os, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import emg3d_tpu as e3
from emg3d_tpu import electrodes, meshes, surveys

shape_classes = json.loads(sys.argv[1])
nfreq = int(sys.argv[2])

h = np.ones(16) * 200.0
grid = meshes.TensorMesh([h, h, h], origin=(-1600.,) * 3)
model = e3.Model(grid, property_x=1.0, mapping='Resistivity')
sources = [electrodes.TxElectricDipole((x, 0., -200., 0., 0.))
           for x in [-300., 300.]]
recs = [electrodes.RxElectricPoint((x, 0., -250., 0., 0.))
        for x in [600., 900.]]
freqs = list(np.logspace(np.log10(0.05), np.log10(12.0), nfreq))
survey = surveys.Survey(sources, recs, freqs, relative_error=0.05)
sim = e3.Simulation(
    survey=survey, model=model, gridding='frequency', tqdm_opts=False,
    solver_opts={'plain': True, 'tol': 1e-6, 'verb': 0},
    **({'shape_classes': shape_classes} if shape_classes else {}))

fkeys = [f'f-{i + 1}' for i in range(nfreq)]
grids = [sim.get_grid('TxED-1', f) for f in fkeys]
shapes = [g.shape_cells for g in grids]
t0 = time.perf_counter()
sim.compute()
cold = time.perf_counter() - t0
ok = all(np.isfinite(sim.data.synthetic).all(axis=(0, 1)))
sim.clean('computed')
t0 = time.perf_counter()
sim.compute()
warm = time.perf_counter() - t0
print("RESULT " + json.dumps({
    "shape_classes": shape_classes,
    "n_shapes": len(set(shapes)),
    "shapes": sorted(map(list, set(shapes))),
    "total_cells": int(sum(np.prod(s) for s in shapes)),
    "cold_s": round(cold, 2), "warm_s": round(warm, 2),
    "all_finite": bool(ok),
}))
'''


def main():
    nfreq = os.environ.get("BENCH_NFREQ", "6")
    growth = float(os.environ.get("BENCH_GROWTH", "1.7"))
    for sc in (False, growth):
        res = subprocess.run(
            [sys.executable, "-c", _CHILD, json.dumps(sc), nfreq],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        line = next((ln for ln in res.stdout.splitlines()
                     if ln.startswith("RESULT ")), None)
        if line is None:
            rec = {"shape_classes": sc, "error": res.stderr[-400:]}
        else:
            rec = json.loads(line[len("RESULT "):])
        rec.update(nfreq=int(nfreq),
                   date=datetime.date.today().isoformat())
        print(json.dumps(rec), flush=True)
        with RESULTS.open("a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
