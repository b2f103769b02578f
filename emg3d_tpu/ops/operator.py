"""Matrix-free curl-curl operator on the staggered Yee grid (TPU-native).

The reference computes the residual with a scalar triple loop over cells
(``amat_x``, emg3d/core.py:57-206).  Here the same operator is expressed as
a vectorized 1-halo stencil over whole field arrays: two nested discrete
curls with dual-grid averaged material parameters plus the sigma term.
Under ``jit`` XLA fuses the entire expression into a few bandwidth-bound
elementwise kernels — the idiomatic TPU formulation of this operator.

Operator (Mulder 2006, Eq. 2; see reference core.py:64-80):

    A e = V (i omega mu_0 sigma~ E - curl (mu_r^-1 curl E))
        = -(eta E)-term + curl-curl-term  (with eta = -smu0*V*sigma~)

Boundary handling matches the reference exactly: rows belonging to
tangential boundary edges get their curl part zeroed (PEC assumption,
core.py:193-198) while the sigma term is kept; edges on the far boundary
nodes (iy=ny / iz=nz planes etc.) are never touched.
"""

import jax.numpy as jnp

__all__ = ["amat_x", "residual", "residual_norm", "edge_curl_factor"]


def _pair_clamped(p, axis):
    """p[i-1] + p[i] along ``axis`` for i in [0..n], indices clamped to cells.

    Input has n entries along ``axis``; output has n+1 (node positions).
    """
    first = jnp.take(p, jnp.array([0]), axis=axis)
    last = jnp.take(p, jnp.array([p.shape[axis] - 1]), axis=axis)
    padded = jnp.concatenate([first, p, last], axis=axis)
    n = p.shape[axis] + 1
    lo = jnp.take(padded, jnp.arange(n), axis=axis)
    hi = jnp.take(padded, jnp.arange(1, n + 1), axis=axis)
    return lo + hi


def _shift_down_clamped(p, axis):
    """p[i-1] along ``axis`` with p[-1] := p[0] (clamped shift)."""
    first = jnp.take(p, jnp.array([0]), axis=axis)
    rest = jnp.take(p, jnp.arange(p.shape[axis] - 1), axis=axis)
    return jnp.concatenate([first, rest], axis=axis)


def _sum_pairs_clamped(p, axis):
    """p[i] + p[i-1] along ``axis`` (clamped at 0); same length as input."""
    return p + _shift_down_clamped(p, axis)


def amat_x(ex, ey, ez, eta_x, eta_y, eta_z, zeta, hx, hy, hz):
    """Apply the system matrix: returns (A e)_x, (A e)_y, (A e)_z.

    Vectorized equivalent of the reference's ``amat_x``
    (emg3d/core.py:57-206) with the sign convention ``A e`` such that
    ``residual = sfield - A e`` and ``matvec = A e``.

    Parameters: field components (edge shapes), volume-scaled model
    parameters (cell shapes), and cell widths (1-D).
    """
    nx, ny, nz = hx.size, hy.size, hz.size

    ihx = (1.0 / hx)[:, None, None]
    ihy = (1.0 / hy)[None, :, None]
    ihz = (1.0 / hz)[None, None, :]

    # --- First curl: V = curl E on the faces (Mulder06 Eq. 7). ------------
    # x-faces (nx+1, ny, nz); y-faces (nx, ny+1, nz); z-faces (nx, ny, nz+1).
    v1 = ((ez[:, 1:, :] - ez[:, :-1, :]) * ihy
          - (ey[:, :, 1:] - ey[:, :, :-1]) * ihz)
    v2 = ((ex[:, :, 1:] - ex[:, :, :-1]) * ihz
          - (ez[1:, :, :] - ez[:-1, :, :]) * ihx)
    v3 = ((ey[1:, :, :] - ey[:-1, :, :]) * ihx
          - (ex[:, 1:, :] - ex[:, :-1, :]) * ihy)

    # --- Scale with dual-grid averaged zeta (factor 0.5 applied at the
    # end, like the reference).  Clamped averages at the boundaries. -------
    u1 = v1 * _pair_clamped(zeta, 0)
    u2 = v2 * _pair_clamped(zeta, 1)
    u3 = v3 * _pair_clamped(zeta, 2)

    # --- Second curl, evaluated on the cell-indexed edge block
    # [0:nx, 0:ny, 0:nz] (the loop range of the reference). ----------------
    u1c = u1[:nx, :, :]      # x-faces at node ix in [0, nx)
    u2c = u2[:, :ny, :]      # y-faces at node iy in [0, ny)
    u3c = u3[:, :, :nz]      # z-faces at node iz in [0, nz)

    u3_ihy = u3c * ihy
    u2_ihz = u2c * ihz
    u1_ihz = u1c * ihz
    u3_ihx = u3c * ihx
    u2_ihx = u2c * ihx
    u1_ihy = u1c * ihy

    rrx = (u3_ihy - _shift_down_clamped(u3_ihy, 1)
           - u2_ihz + _shift_down_clamped(u2_ihz, 2))
    rry = (u1_ihz - _shift_down_clamped(u1_ihz, 2)
           - u3_ihx + _shift_down_clamped(u3_ihx, 0))
    rrz = (u2_ihx - _shift_down_clamped(u2_ihx, 0)
           - u1_ihy + _shift_down_clamped(u1_ihy, 1))

    # Zero the curl part on tangential boundary edges (PEC rows,
    # reference core.py:193-198); the sigma term below is kept.
    rrx = rrx.at[:, 0, :].set(0).at[:, :, 0].set(0)
    rry = rry.at[0, :, :].set(0).at[:, :, 0].set(0)
    rrz = rrz.at[0, :, :].set(0).at[:, 0, :].set(0)

    # --- Sigma term: 4-cell averages of eta around each edge. -------------
    stx = _sum_pairs_clamped(_sum_pairs_clamped(eta_x, 1), 2)
    sty = _sum_pairs_clamped(_sum_pairs_clamped(eta_y, 0), 2)
    stz = _sum_pairs_clamped(_sum_pairs_clamped(eta_z, 0), 1)

    ax_blk = 0.5 * rrx - 0.25 * stx * ex[:, :ny, :nz]
    ay_blk = 0.5 * rry - 0.25 * sty * ey[:nx, :, :nz]
    az_blk = 0.5 * rrz - 0.25 * stz * ez[:nx, :ny, :]

    # Far-boundary edges (iy=ny, iz=nz planes etc.) stay untouched (zero
    # operator rows), exactly like the reference's loop bounds.
    ax = jnp.zeros_like(ex).at[:, :ny, :nz].set(ax_blk)
    ay = jnp.zeros_like(ey).at[:nx, :, :nz].set(ay_blk)
    az = jnp.zeros_like(ez).at[:nx, :ny, :].set(az_blk)

    return ax, ay, az


def residual(sx, sy, sz, ex, ey, ez, eta_x, eta_y, eta_z, zeta, hx, hy, hz):
    """Residual r = s - A e (reference solver.py:1022-1070)."""
    ax, ay, az = amat_x(ex, ey, ez, eta_x, eta_y, eta_z, zeta, hx, hy, hz)
    return sx - ax, sy - ay, sz - az


def residual_norm(rx, ry, rz):
    """l2-norm over all three residual components."""
    return jnp.sqrt(
        jnp.sum(jnp.abs(rx) ** 2)
        + jnp.sum(jnp.abs(ry) ** 2)
        + jnp.sum(jnp.abs(rz) ** 2))


def edge_curl_factor(ex, ey, ez, hx, hy, hz, zeta):
    """curl E on the faces, divided by dual-grid-averaged factor arrays.

    Used by ``get_magnetic_field``: H = curl E / (zeta * smu0), where the
    input ``zeta`` here is V/(mu_r*smu0) (reference fields.py:941-1009).
    Boundary faces (first/last face of each orientation) are zero.
    """
    hx = jnp.asarray(hx)
    hy = jnp.asarray(hy)
    hz = jnp.asarray(hz)
    ihx = (1.0 / hx)[:, None, None]
    ihy = (1.0 / hy)[None, :, None]
    ihz = (1.0 / hz)[None, None, :]

    fx = ((ez[:, 1:, :] - ez[:, :-1, :]) * ihy
          - (ey[:, :, 1:] - ey[:, :, :-1]) * ihz)
    fy = ((ex[:, :, 1:] - ex[:, :, :-1]) * ihz
          - (ez[1:, :, :] - ez[:-1, :, :]) * ihx)
    fz = ((ey[1:, :, :] - ey[:-1, :, :]) * ihx
          - (ex[:, 1:, :] - ex[:, :-1, :]) * ihy)

    def _dual(h, n_plus_1):
        """h[i-1] + h[i], clamped, at node positions."""
        hpad = jnp.concatenate([h[:1], h, h[-1:]])
        return hpad[:n_plus_1] + hpad[1:n_plus_1 + 1]

    dx = _dual(hx, hx.size + 1)[:, None, None]
    dy = _dual(hy, hy.size + 1)[None, :, None]
    dz = _dual(hz, hz.size + 1)[None, None, :]

    zx = _pair_clamped(zeta, 0)
    zy = _pair_clamped(zeta, 1)
    zz = _pair_clamped(zeta, 2)

    mx = fx * zx / (dx * hy[None, :, None] * hz[None, None, :])
    my = fy * zy / (hx[:, None, None] * dy * hz[None, None, :])
    mz = fz * zz / (hx[:, None, None] * hy[None, :, None] * dz)

    # Reference leaves faces at index 0 (and the never-touched last face)
    # at zero (fields.py:1004-1009).
    mx = mx.at[0, :, :].set(0).at[-1, :, :].set(0)
    my = my.at[:, 0, :].set(0).at[:, -1, :].set(0)
    mz = mz.at[:, :, 0].set(0).at[:, :, -1].set(0)

    return mx, my, mz
