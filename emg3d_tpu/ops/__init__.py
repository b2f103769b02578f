"""TPU-native compute kernels (JAX/XLA, Pallas) for the multigrid solver.

These modules are the TPU equivalents of the reference's numba-jitted
kernels in emg3d/core.py:

- :mod:`emg3d_tpu.ops.operator`  — matrix-free operator A x / residual
  (reference ``amat_x``, core.py:57-206) and the edge-curl (fields.py:941).
- :mod:`emg3d_tpu.ops.smoothers` — red-black node smoother (reference
  ``gauss_seidel``, core.py:210-503) and red-black line relaxation with
  batched block-tridiagonal solves (reference ``gauss_seidel_{x,y,z}`` +
  banded LDLT ``solve``, core.py:506-1616).
- :mod:`emg3d_tpu.ops.transfer`  — separable restriction with
  operator-dependent weights (reference ``restrict``/``restrict_weights``,
  core.py:1620-2076) and bilinear prolongation (solver.py:947-1019).
"""

from emg3d_tpu.ops import operator, smoothers, transfer  # noqa: F401
