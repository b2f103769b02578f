"""Time-domain (transient) modelling via the Fourier machinery.

Frequency-domain solves at the Fourier-required frequencies are
transformed to a transient switch-off response and compared with the
closed-form fullspace solution. Uses the layered (1-D) engine for the
frequency sweep so the example runs in seconds; swap in
``emg3d.solve_source`` per frequency for a 3-D model.

Run from the repository root:  python examples/03_transient_fullspace.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")   # drop for TPU runs
jax.config.update("jax_enable_x64", True)

import numpy as np                                    # noqa: E402
import emg3d_tpu as emg3d                             # noqa: E402
from emg3d_tpu import layered                         # noqa: E402


def main():
    times = np.logspace(-2, 1, 13)
    offset = 900.0
    res = 1.0

    fourier = emg3d.Fourier(time=times, fmin=1e-3, fmax=1e2, signal=-1)
    print(f"{fourier.freq_required.size} required frequencies, "
          f"{fourier.freq_compute.size} to compute "
          f"[{fourier.freq_compute[0]:.2e}, "
          f"{fourier.freq_compute[-1]:.2e}] Hz")

    # Frequency sweep (1-D engine; x-dipole, inline receiver).
    fresp = np.array([
        layered.dipole_layered((0, 0, 0, 0, 0), [(offset, 0, 0, 0, 0)],
                               [], [res], f)[0]
        for f in fourier.freq_compute])

    tresp = fourier.freq2time(fresp, offset)

    # Closed-form transient switch-off response for comparison.
    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", "tests"))
    import alternatives
    exact = alternatives.fullspace_dipole_time(
        np.array([[offset, 0., 0.]]), (0., 0., 0.), times, res,
        signal=-1)[:, 0, 0]

    print(f"{'t [s]':>8} {'E computed':>13} {'E exact':>13} {'err':>8}")
    for t, c, e in zip(times, np.asarray(tresp).ravel(), exact):
        print(f"{t:8.3f} {c:13.4e} {e:13.4e} "
              f"{abs(c - e) / abs(e):8.1%}")


if __name__ == "__main__":
    main()
