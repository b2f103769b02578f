"""Tests for the inter-grid transfer operators (ops.transfer)."""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

import alternatives
from emg3d_tpu import meshes
from emg3d_tpu.ops import transfer


def grids(shape, seed=1, stretched=True):
    rng = np.random.default_rng(seed)
    if stretched:
        h = [50 * (1 + rng.random(n)) for n in shape]
    else:
        h = [np.ones(n) * 50.0 for n in shape]
    grid = meshes.TensorMesh(h, origin=(0, 0, 0))
    ch = [np.diff(getattr(grid, "nodes_" + c)[::2]) for c in "xyz"]
    cgrid = meshes.BaseMesh(ch, (0, 0, 0))
    return grid, cgrid


def weights(grid, cgrid):
    out = []
    for i, c in enumerate("xyz"):
        out.append(transfer.restrict_weights(
            getattr(grid, "nodes_" + c), getattr(grid, "cell_centers_" + c),
            grid.h[i], getattr(cgrid, "nodes_" + c),
            getattr(cgrid, "cell_centers_" + c), cgrid.h[i]))
    return out


@pytest.mark.parametrize("shape", [(8, 6, 4), (4, 4, 4)])
def test_restrict_vs_oracle(shape):
    grid, cgrid = grids(shape)
    rng = np.random.default_rng(7)

    rx = (rng.standard_normal(grid.shape_edges_x)
          + 1j * rng.standard_normal(grid.shape_edges_x))
    ry = (rng.standard_normal(grid.shape_edges_y)
          + 1j * rng.standard_normal(grid.shape_edges_y))
    rz = (rng.standard_normal(grid.shape_edges_z)
          + 1j * rng.standard_normal(grid.shape_edges_z))

    ws = weights(grid, cgrid)
    want = alternatives.alt_restrict(rx, ry, rz, grid, cgrid, *ws)

    rw = tuple((jnp.asarray(w[0]), jnp.asarray(w[1]), jnp.asarray(w[2]))
               for w in ws)
    got = transfer.restrict(jnp.asarray(rx), jnp.asarray(ry),
                            jnp.asarray(rz), rw, (True, True, True))

    for a, b in zip(want, got):
        assert_allclose(a, np.asarray(b), rtol=1e-12, atol=1e-13)


def test_restrict_weights_sum_property():
    """Weights reproduce constants away from boundaries: wl + w0 + wr
    scaled by the dual widths integrates a constant residual exactly."""
    grid, cgrid = grids((8, 8, 8), stretched=True)
    for i, c in enumerate("xyz"):
        wl, w0, wr = transfer.restrict_weights(
            getattr(grid, "nodes_" + c), getattr(grid, "cell_centers_" + c),
            grid.h[i], getattr(cgrid, "nodes_" + c),
            getattr(cgrid, "cell_centers_" + c), cgrid.h[i])
        assert np.all(wl > 0) and np.all(wr > 0)
        assert_allclose(w0, 1.0)


@pytest.mark.parametrize("shape", [(8, 6, 4)])
def test_prolong_vs_oracle(shape):
    grid, cgrid = grids(shape, seed=3)
    rng = np.random.default_rng(11)

    cex = (rng.standard_normal(cgrid.shape_edges_x)
           + 1j * rng.standard_normal(cgrid.shape_edges_x))
    cey = (rng.standard_normal(cgrid.shape_edges_y)
           + 1j * rng.standard_normal(cgrid.shape_edges_y))
    cez = (rng.standard_normal(cgrid.shape_edges_z)
           + 1j * rng.standard_normal(cgrid.shape_edges_z))

    want = alternatives.alt_prolong(grid, cgrid, cex, cey, cez)

    pm = []
    for i, c in enumerate("xyz"):
        idx, w = transfer.prolong_meta(getattr(cgrid, "nodes_" + c),
                                       getattr(grid, "nodes_" + c))
        pm.append((jnp.asarray(idx), jnp.asarray(w)))
    e0 = tuple(jnp.zeros(s, dtype=complex) for s in (
        grid.shape_edges_x, grid.shape_edges_y, grid.shape_edges_z))
    got = transfer.prolong(*e0, jnp.asarray(cex), jnp.asarray(cey),
                           jnp.asarray(cez), tuple(pm), (True, True, True))

    for a, b in zip(want, got):
        assert_allclose(a, np.asarray(b), rtol=1e-12, atol=1e-13)


def test_restrict_model_parameters():
    rng = np.random.default_rng(5)
    p = rng.random((4, 6, 8))

    full = np.asarray(transfer.restrict_model_parameters(p, (True,) * 3))
    want = (p[::2, ::2, ::2] + p[1::2, ::2, ::2] + p[::2, 1::2, ::2]
            + p[::2, ::2, 1::2] + p[1::2, 1::2, ::2] + p[1::2, ::2, 1::2]
            + p[::2, 1::2, 1::2] + p[1::2, 1::2, 1::2])
    assert_allclose(full, want)
    assert_allclose(full.sum(), p.sum())  # conservation

    semi = np.asarray(transfer.restrict_model_parameters(
        p, (False, True, False)))
    assert semi.shape == (4, 3, 8)
    assert_allclose(semi, p[:, ::2, :] + p[:, 1::2, :])
