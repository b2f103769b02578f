"""Survey simulation with misfit, adjoint gradient and J·v products.

Builds a two-source, multi-receiver survey over a small model, computes
synthetic "observed" data with noise, then the data misfit, the
adjoint-state gradient (the workhorse of 3-D CSEM inversion) and a
Jacobian-vector product.

Run from the repository root:  python examples/02_gradient_and_sensitivities.py
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
    grid = emg3d.TensorMesh([np.full(24, 100.0)] * 3,
                            origin=(-1200, -1200, -2000))
    res = np.ones(grid.shape_cells)
    res[:, :, grid.cell_centers_z > -400] = 0.3
    model = emg3d.Model(grid, property_x=res, mapping='Resistivity')

    survey = emg3d.Survey(
        sources=[emg3d.electrodes.TxElectricPoint((x, 0, -500, 0, 0))
                 for x in (-400.0, 400.0)],
        receivers=[emg3d.electrodes.RxElectricPoint((x, 0, -600, 0, 0))
                   for x in np.arange(-800, 801, 400.0)],
        frequencies=1.0,
        noise_floor=1e-15, relative_error=0.05)

    sim = emg3d.Simulation(
        survey=survey, model=model, gridding='same', verb=-1,
        receiver_interpolation='linear')

    # Synthetic observed data (with noise), then misfit + gradient.
    sim.compute(observed=True, add_noise=True)
    print(f"misfit: {sim.misfit:.4e}")

    grad = sim.gradient
    print(f"gradient shape {grad.shape}; "
          f"max |dphi/dm| = {np.max(np.abs(grad)):.3e}")

    # Jacobian-vector product for a model perturbation.
    v = np.zeros(model.shape)
    v[10:14, 10:14, 8:12] = 1.0
    jv = sim.jvec(v)
    print(f"jvec: {np.nanmax(np.abs(jv)):.3e} max data perturbation")


if __name__ == "__main__":
    main()
