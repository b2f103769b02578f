"""Split-real GS phase (ops.pallas_gs): the Pallas TPU kernel path.

The split-real core must agree with the complex implementation
(ops.smoothers.gauss_seidel_phase) to machine precision — same
arithmetic, re/im carried explicitly.  The pallas_call wrapper is
checked in interpreter mode (Mosaic compilation requires TPU
hardware).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from emg3d_tpu.ops import pallas_gs, smoothers

# Compile-heavy suite (many per-shape executables on XLA:CPU):
# excluded from the quick tier, see CLAUDE.md.
pytestmark = pytest.mark.slow


def _random_problem(seed=5, nx=9, ny=8, nz=7):
    rng = np.random.default_rng(seed)
    hx = jnp.asarray(rng.uniform(20, 60, nx))
    hy = jnp.asarray(rng.uniform(20, 60, ny))
    hz = jnp.asarray(rng.uniform(20, 60, nz))
    shp = [(nx, ny + 1, nz + 1), (nx + 1, ny, nz + 1),
           (nx + 1, ny + 1, nz)]

    def f(s):
        return jnp.asarray(rng.normal(size=s) + 1j * rng.normal(size=s))

    e = tuple(f(s) for s in shp)
    s = tuple(f(s_) for s_ in shp)
    eta = tuple(jnp.asarray(
        -(rng.uniform(1e3, 5e3, (nx, ny, nz)))
        + 1j * rng.uniform(1e2, 5e2, (nx, ny, nz))) for _ in range(3))
    zeta = jnp.asarray(rng.uniform(1e3, 2e3, (nx, ny, nz)))
    return e, s, eta, zeta, hx, hy, hz


@pytest.mark.parametrize("color", [(0, 0, 0), (1, 0, 1), (0, 1, 1),
                                   (1, 1, 1)])
def test_split_equals_complex(color):
    e, s, eta, zeta, hx, hy, hz = _random_problem()
    ref = smoothers.gauss_seidel_phase(*e, *s, *eta, zeta, hx, hy, hz,
                                       *color)
    spl = pallas_gs.gauss_seidel_phase_split(*e, *s, *eta, zeta,
                                             hx, hy, hz, *color)
    for a, b in zip(ref, spl):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12)


def test_pallas_interpret_equals_complex():
    e, s, eta, zeta, hx, hy, hz = _random_problem(seed=9)
    ref = smoothers.gauss_seidel_phase(*e, *s, *eta, zeta, hx, hy, hz,
                                       0, 0, 0)
    pal = pallas_gs.gauss_seidel_phase_pallas(
        *e, *s, *eta, zeta, hx, hy, hz, 0, 0, 0, interpret=True)
    for a, b in zip(ref, pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12)


def test_smoother_dispatch_env(monkeypatch):
    """EMG3D_TPU_SMOOTHER='pallas-interpret' routes
    smoothers.gauss_seidel_phase through the Pallas kernel (same
    numbers as the xla path)."""
    e, s, eta, zeta, hx, hy, hz = _random_problem(seed=3, nx=6, ny=6,
                                                  nz=6)
    ref = smoothers.gauss_seidel_phase(*e, *s, *eta, zeta, hx, hy, hz,
                                       0, 0, 0)
    monkeypatch.setenv("EMG3D_TPU_SMOOTHER", "pallas-interpret")
    out = smoothers.gauss_seidel_phase(*e, *s, *eta, zeta, hx, hy, hz,
                                       0, 0, 0)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12)


@pytest.mark.parametrize("color", [(0, 0, 0), (1, 0, 1), (1, 1, 1)])
@pytest.mark.parametrize("tile", [2, 3])
def test_tiled_interpret_equals_complex(color, tile):
    """The fine-level tiled double-buffered kernel == complex phase.

    nx=11 gives 5 phase blocks along x: tile=2 exercises a ragged
    last tile (overlap-recompute), tile=3 a clamped origin."""
    e, s, eta, zeta, hx, hy, hz = _random_problem(seed=13, nx=11,
                                                  ny=9, nz=8)
    ref = smoothers.gauss_seidel_phase(*e, *s, *eta, zeta, hx, hy, hz,
                                       *color)
    out = pallas_gs.gauss_seidel_phase_pallas_tiled(
        *e, *s, *eta, zeta, hx, hy, hz, *color, tile=tile,
        interpret=True)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12)


def test_tiled_dispatch_env(monkeypatch):
    """EMG3D_TPU_PALLAS_TILED=1 + pallas-interpret routes the phase
    through the tiled kernel (same numbers as the xla path)."""
    e, s, eta, zeta, hx, hy, hz = _random_problem(seed=7, nx=8, ny=7,
                                                  nz=6)
    ref = smoothers.gauss_seidel_phase(*e, *s, *eta, zeta, hx, hy, hz,
                                       1, 0, 0)
    monkeypatch.setenv("EMG3D_TPU_SMOOTHER", "pallas-interpret")
    monkeypatch.setenv("EMG3D_TPU_PALLAS_TILED", "1")
    out = smoothers.gauss_seidel_phase(*e, *s, *eta, zeta, hx, hy, hz,
                                       1, 0, 0)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12)


def test_tiled_full_sweep():
    """A full 8-color sweep of tiled phases == the complex sweep."""
    e, s, eta, zeta, hx, hy, hz = _random_problem(seed=17, nx=10,
                                                  ny=9, nz=7)
    shape = (hx.size, hy.size, hz.size)
    ref = smoothers.gauss_seidel_sweep(*e, *s, *eta, zeta, hx, hy, hz,
                                       False)
    out = e
    for c in smoothers.phase_colors(shape, False):
        out = pallas_gs.gauss_seidel_phase_pallas_tiled(
            *out, *s, *eta, zeta, hx, hy, hz, *c, tile=2,
            interpret=True)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-11)


def test_full_sweep_through_split_phases():
    """A full 8-color sweep composed of split phases == complex sweep."""
    e, s, eta, zeta, hx, hy, hz = _random_problem(seed=11)
    shape = (hx.size, hy.size, hz.size)
    ref = smoothers.gauss_seidel_sweep(*e, *s, *eta, zeta, hx, hy, hz,
                                       False)
    out = e
    for c in smoothers.phase_colors(shape, False):
        out = pallas_gs.gauss_seidel_phase_split(
            *out, *s, *eta, zeta, hx, hy, hz, *c)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-11)
