"""Tests for the TPU-native curl-curl operator (ops.operator)."""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

import alternatives
from emg3d_tpu import fields, meshes, models
from emg3d_tpu.ops import operator


def random_setup(shape, seed=11, case="triaxial", stretched=True):
    """Random stretched grid + model + fields."""
    rng = np.random.default_rng(seed)
    if stretched:
        h = [50 * (1 + rng.random(n)) for n in shape]
    else:
        h = [np.ones(n) * 37.5 for n in shape]
    # Center the grid on the origin so the test source is always inside.
    grid = meshes.TensorMesh(h, origin=[-0.5 * np.sum(hh) for hh in h])

    kwargs = {"property_x": 1 + 9 * rng.random(shape)}
    if case in ("HTI", "triaxial"):
        kwargs["property_y"] = 1 + 9 * rng.random(shape)
    if case in ("VTI", "triaxial"):
        kwargs["property_z"] = 1 + 9 * rng.random(shape)
    model = models.Model(grid, mu_r=0.5 + rng.random(shape), **kwargs)

    sfield = fields.get_source_field(
        grid, (0, 0, 0, 20, 30), frequency=0.77)
    vmodel = models.VolumeModel(model, sfield)

    e = fields.Field(grid, frequency=0.77)
    e.field = rng.random(e.field.size) + 1j * rng.random(e.field.size)
    return grid, vmodel, e


@pytest.mark.parametrize("shape", [(4, 5, 6), (2, 3, 4)])
@pytest.mark.parametrize("case", ["isotropic", "triaxial"])
def test_amat_x_vs_oracle(shape, case):
    """Vectorized operator == scalar-loop oracle (to rounding)."""
    grid, vm, e = random_setup(shape, case=case)

    ax, ay, az = operator.amat_x(
        jnp.asarray(np.ascontiguousarray(e.fx)),
        jnp.asarray(np.ascontiguousarray(e.fy)),
        jnp.asarray(np.ascontiguousarray(e.fz)),
        jnp.asarray(vm.eta_x), jnp.asarray(vm.eta_y),
        jnp.asarray(vm.eta_z), jnp.asarray(vm.zeta),
        jnp.asarray(grid.h[0]), jnp.asarray(grid.h[1]),
        jnp.asarray(grid.h[2]))

    bx, by, bz = alternatives.alt_amat_x(
        np.asarray(e.fx), np.asarray(e.fy), np.asarray(e.fz),
        vm.eta_x, vm.eta_y, vm.eta_z, vm.zeta, *grid.h)

    assert_allclose(np.asarray(ax), bx, rtol=1e-12, atol=1e-14)
    assert_allclose(np.asarray(ay), by, rtol=1e-12, atol=1e-14)
    assert_allclose(np.asarray(az), bz, rtol=1e-12, atol=1e-14)


def test_operator_symmetry():
    """A is complex-symmetric on interior edges: <x, A y> == <A x, y>."""
    grid, vm, _ = random_setup((4, 4, 4), seed=3)
    A = alternatives.dense_matrix(grid, vm)
    mask = alternatives.interior_mask(grid)
    Ai = A[np.ix_(mask, mask)]
    assert_allclose(Ai, Ai.T, rtol=1e-11, atol=1e-20)


def test_permutation_covariance():
    """Operator is covariant under coordinate permutation (x <-> y)."""
    grid, vm, e = random_setup((4, 5, 6), seed=7)

    args = (jnp.asarray(np.ascontiguousarray(e.fx)),
            jnp.asarray(np.ascontiguousarray(e.fy)),
            jnp.asarray(np.ascontiguousarray(e.fz)),
            jnp.asarray(vm.eta_x), jnp.asarray(vm.eta_y),
            jnp.asarray(vm.eta_z), jnp.asarray(vm.zeta),
            jnp.asarray(grid.h[0]), jnp.asarray(grid.h[1]),
            jnp.asarray(grid.h[2]))
    ax, ay, az = operator.amat_x(*args)

    tp = (1, 0, 2)
    ex, ey, ez, eta_x, eta_y, eta_z, zeta, hx, hy, hz = args
    ay2, ax2, az2 = operator.amat_x(
        ey.transpose(tp), ex.transpose(tp), ez.transpose(tp),
        eta_y.transpose(tp), eta_x.transpose(tp), eta_z.transpose(tp),
        zeta.transpose(tp), hy, hx, hz)

    assert_allclose(np.asarray(ax), np.asarray(ax2).transpose(tp),
                    rtol=1e-12)
    assert_allclose(np.asarray(ay), np.asarray(ay2).transpose(tp),
                    rtol=1e-12)
    assert_allclose(np.asarray(az), np.asarray(az2).transpose(tp),
                    rtol=1e-12)


def test_residual_zero_field():
    """Residual of a zero field is the source field."""
    grid, vm, e = random_setup((4, 4, 4), seed=5)
    sx = np.asarray(e.fx)
    z = jnp.zeros_like(jnp.asarray(sx))
    zy = jnp.zeros(grid.shape_edges_y, dtype=z.dtype)
    zz = jnp.zeros(grid.shape_edges_z, dtype=z.dtype)
    rx, ry, rz = operator.residual(
        jnp.asarray(sx), zy, zz, z, zy, zz,
        jnp.asarray(vm.eta_x), jnp.asarray(vm.eta_y), jnp.asarray(vm.eta_z),
        jnp.asarray(vm.zeta), jnp.asarray(grid.h[0]), jnp.asarray(grid.h[1]),
        jnp.asarray(grid.h[2]))
    assert_allclose(np.asarray(rx), sx, rtol=1e-13)
