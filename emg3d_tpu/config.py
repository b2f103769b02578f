"""Global numeric configuration for the TPU-native emg3d rebuild.

The reference code (emsig/emg3d) is complex128 throughout (it runs on CPU via
numba).  On TPU, float64 is emulated and slow, while float32/complex64 maps
natively onto the VPU/MXU.  We therefore make the working precision a global,
derived from JAX's x64 mode:

- tests / CPU parity runs enable ``jax.config.update('jax_enable_x64', True)``
  and get float64/complex128, matching the reference bit-for-bit semantics;
- TPU production runs keep x64 off and run in float32/complex64, which still
  converges to ~1e-6 relative residual for well-scaled systems.

Reference: dtype selection in emg3d/fields.py:93-107 (frequency>0 -> complex,
frequency<0 [Laplace] -> real).
"""

import jax
import numpy as np

__all__ = ["float_dtype", "complex_dtype", "solve_dtype"]


def x64_enabled():
    """Return True if JAX runs in 64-bit mode."""
    return jax.config.read("jax_enable_x64")


def float_dtype():
    """Working real dtype (float64 under x64, else float32)."""
    return np.float64 if x64_enabled() else np.float32


def complex_dtype():
    """Working complex dtype (complex128 under x64, else complex64)."""
    return np.complex128 if x64_enabled() else np.complex64


def solve_dtype(frequency):
    """HOST Field dtype given the frequency convention of the reference.

    - ``frequency > 0``: frequency domain, s = i*2*pi*f -> complex dtype;
    - ``frequency < 0``: Laplace domain, s = -frequency (real) -> real dtype;
    - ``frequency is None``: frequency-independent source vector -> real.

    Mirrors emg3d/fields.py:93-102.  Host-side containers (Field, Model)
    are ALWAYS float64/complex128 for I/O parity with the reference and
    so that the split-precision device solve can be exported without
    losing its achieved accuracy; only device arrays carry the working
    precision (:func:`float_dtype`/:func:`complex_dtype`).
    """
    if frequency is None:
        return np.float64
    if frequency > 0:
        return np.complex128
    if frequency < 0:
        return np.float64
    raise ValueError(
        "`frequency` must be f>0 (frequency domain) or f<0 (Laplace domain). "
        f"Provided: {frequency} Hz."
    )
