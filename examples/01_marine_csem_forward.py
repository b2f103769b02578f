"""Marine CSEM forward model: resistive target under sea water.

A minimal end-to-end forward model — automatic gridding, layered
background with a buried resistor, multi-offset receiver line — small
enough to run on CPU in a couple of minutes.

Run from the repository root:  python examples/01_marine_csem_forward.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")   # drop for TPU runs
jax.config.update("jax_enable_x64", True)

import numpy as np                                    # noqa: E402
import emg3d_tpu as emg3d                             # noqa: E402


def main():
    frequency = 1.0
    src = (0, 0, -950, 0, 0)        # x-dipole 50 m above the seafloor

    # Automatic gridding: water (0.3) to background (1) Ωm.  The
    # coarse min_width keeps the example fast on CPU; tighten it (and
    # drop the cpu config above) for production TPU runs.
    grid = emg3d.construct_mesh(
        frequency=frequency, properties=[0.3, 1.0, 1.0, 0.3],
        center=(0, 0, -1000), seasurface=0.0,
        domain=([-3000, 3000], [-400, 400], [-2400, 0]),
        min_width_limits=200.0, verb=0)
    print(grid)

    # Model: sea water above -1000 m, halfspace below, 100 Ωm target.
    res = np.ones(grid.shape_cells)
    zc = grid.cell_centers_z
    res[:, :, zc > -1000] = 0.3
    xc, yc = grid.cell_centers_x, grid.cell_centers_y
    tgt = ((np.abs(xc[:, None, None]) < 1500)
           & (np.abs(yc[None, :, None]) < 3000)
           & (zc[None, None, :] > -1900) & (zc[None, None, :] < -1700))
    res[tgt] = 100.0
    model = emg3d.Model(grid, property_x=res, mapping='Resistivity')

    efield, info = emg3d.solve_source(
        model, src, frequency, return_info=True, verb=1,
        linerelaxation=False)   # fewer kernels to compile; the auto
    # grid is near-uniform, where line relaxation adds little.
    print(f"solver: {info['exit_message']} in {info['it_mg']} MG / "
          f"{info['it_ssl']} Krylov iterations")

    offsets = np.arange(500, 3001, 500.0)
    resp = emg3d.fields.get_receiver(
        efield, (offsets, np.zeros_like(offsets),
                 np.full_like(offsets, -1000.0), 0, 0))
    for off, r in zip(offsets, np.asarray(resp)):
        print(f"  offset {off:6.0f} m:  |E| = {abs(r):.3e} V/m   "
              f"phase = {np.angle(r, deg=True):7.2f}°")


if __name__ == "__main__":
    main()
