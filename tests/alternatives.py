"""Independent oracle implementations for testing.

Same pattern as the reference's tests/alternatives.py: simple, slow,
obviously-correct implementations written directly from the continuous
equations, used to validate the fast TPU kernels.
"""

import numpy as np
import scipy.constants as const


def alt_amat_x(ex, ey, ez, eta_x, eta_y, eta_z, zeta, hx, hy, hz):
    """Per-edge scalar-loop application of A e (oracle).

    Directly transcribes the finite-integration discretization of
    V (i w mu0 sigma~ E - curl(zeta curl E)) per edge: for every interior
    (and PEC-row) edge evaluate the four surrounding face-curls and the
    4-cell eta average.  Slow; for small test grids only.
    """
    nx, ny, nz = len(hx), len(hy), len(hz)

    def c(i, n):
        return min(max(i, 0), n - 1)

    # Face curls, with zeta-averaging across the face-normal direction.
    def u1(i, j, k):  # x-face (node i, cell j, cell k)
        v = ((ez[i, j + 1, k] - ez[i, j, k]) / hy[j]
             - (ey[i, j, k + 1] - ey[i, j, k]) / hz[k])
        return v * (zeta[c(i - 1, nx), j, k] + zeta[c(i, nx), j, k])

    def u2(i, j, k):  # y-face (cell i, node j, cell k)
        v = ((ex[i, j, k + 1] - ex[i, j, k]) / hz[k]
             - (ez[i + 1, j, k] - ez[i, j, k]) / hx[i])
        return v * (zeta[i, c(j - 1, ny), k] + zeta[i, c(j, ny), k])

    def u3(i, j, k):  # z-face (cell i, cell j, node k)
        v = ((ey[i + 1, j, k] - ey[i, j, k]) / hx[i]
             - (ex[i, j + 1, k] - ex[i, j, k]) / hy[j])
        return v * (zeta[i, j, c(k - 1, nz)] + zeta[i, j, c(k, nz)])

    ax = np.zeros_like(ex)
    ay = np.zeros_like(ey)
    az = np.zeros_like(ez)

    # x-edges at (cell i, node j, node k), loop block of the reference.
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                st = (eta_x[i, c(j - 1, ny), c(k - 1, nz)]
                      + eta_x[i, c(j - 1, ny), k]
                      + eta_x[i, j, c(k - 1, nz)] + eta_x[i, j, k])
                if j == 0 or k == 0:
                    cc = 0.0
                else:
                    cc = (u3(i, j, k) / hy[j] - u3(i, j - 1, k) / hy[j - 1]
                          - u2(i, j, k) / hz[k] + u2(i, j, k - 1) / hz[k - 1])
                ax[i, j, k] = 0.5 * cc - 0.25 * st * ex[i, j, k]

    # y-edges at (node i, cell j, node k).
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                st = (eta_y[c(i - 1, nx), j, c(k - 1, nz)]
                      + eta_y[i, j, c(k - 1, nz)]
                      + eta_y[c(i - 1, nx), j, k] + eta_y[i, j, k])
                if i == 0 or k == 0:
                    cc = 0.0
                else:
                    cc = (u1(i, j, k) / hz[k] - u1(i, j, k - 1) / hz[k - 1]
                          - u3(i, j, k) / hx[i] + u3(i - 1, j, k) / hx[i - 1])
                ay[i, j, k] = 0.5 * cc - 0.25 * st * ey[i, j, k]

    # z-edges at (node i, node j, cell k).
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                st = (eta_z[c(i - 1, nx), c(j - 1, ny), k]
                      + eta_z[i, c(j - 1, ny), k]
                      + eta_z[c(i - 1, nx), j, k] + eta_z[i, j, k])
                if i == 0 or j == 0:
                    cc = 0.0
                else:
                    cc = (u2(i, j, k) / hx[i] - u2(i - 1, j, k) / hx[i - 1]
                          - u1(i, j, k) / hy[j] + u1(i, j - 1, k) / hy[j - 1])
                az[i, j, k] = 0.5 * cc - 0.25 * st * ez[i, j, k]

    return ax, ay, az


def fullspace_dipole(points, src, frequency, resistivity, azimuth=0.0,
                     elevation=0.0):
    """Analytical E-field of a unit electric point dipole in a fullspace.

    Frequency-domain diffusive solution (Ward & Hohmann 1988, electric
    dipole in a homogeneous conducting wholespace), s = i*2*pi*f
    convention to match the solver:

        E(r) = e^{-g r}/(4 pi sigma r^3) [ (g^2 r^2 + 3 g r + 3)(rh.p)rh
                                           - (g^2 r^2 + g r + 1) p ]

    with g = sqrt(i omega mu0 sigma).  Returns the complex E-vector(s) at
    ``points`` (n, 3).
    """
    from emg3d_tpu.electrodes import rotation

    sigma = 1.0 / resistivity
    omega = 2 * np.pi * frequency
    gam = np.sqrt(1j * omega * const.mu_0 * sigma)

    p = rotation(azimuth, elevation)
    points = np.atleast_2d(points)
    rvec = points - np.asarray(src)[None, :]
    r = np.linalg.norm(rvec, axis=1)
    rh = rvec / r[:, None]

    gr = gam * r
    fac = np.exp(-gr) / (4 * np.pi * sigma * r ** 3)
    t1 = (gr ** 2 + 3 * gr + 3)[:, None] * (rh @ p)[:, None] * rh
    t2 = (gr ** 2 + gr + 1)[:, None] * p[None, :]
    return fac[:, None] * (t1 - t2)


def dense_matrix(grid, vmodel, dtype=np.complex128):
    """Build the dense system matrix by applying amat_x to unit vectors.

    Only feasible for tiny grids; used to cross-validate the solver
    against a direct dense solve.
    """
    import jax.numpy as jnp

    from emg3d_tpu.ops import operator

    shapes = [grid.shape_edges_x, grid.shape_edges_y, grid.shape_edges_z]
    sizes = [int(np.prod(s)) for s in shapes]
    n = sum(sizes)

    eta_x = jnp.asarray(vmodel.eta_x)
    eta_y = jnp.asarray(vmodel.eta_y)
    eta_z = jnp.asarray(vmodel.eta_z)
    zeta = jnp.asarray(vmodel.zeta)
    hx = jnp.asarray(grid.h[0])
    hy = jnp.asarray(grid.h[1])
    hz = jnp.asarray(grid.h[2])

    def matvec(v):
        ex = jnp.asarray(v[:sizes[0]].reshape(shapes[0]))
        ey = jnp.asarray(v[sizes[0]:sizes[0] + sizes[1]].reshape(shapes[1]))
        ez = jnp.asarray(v[sizes[0] + sizes[1]:].reshape(shapes[2]))
        ax, ay, az = operator.amat_x(ex, ey, ez, eta_x, eta_y, eta_z, zeta,
                                     hx, hy, hz)
        return np.concatenate([np.asarray(ax).ravel(),
                               np.asarray(ay).ravel(),
                               np.asarray(az).ravel()])

    A = np.zeros((n, n), dtype=dtype)
    eye = np.eye(n, dtype=dtype)
    for i in range(n):
        A[:, i] = matvec(eye[i])
    return A


def interior_mask(grid):
    """Boolean mask (concatenated C-order [ex, ey, ez]) of interior edges."""
    mx = np.zeros(grid.shape_edges_x, dtype=bool)
    my = np.zeros(grid.shape_edges_y, dtype=bool)
    mz = np.zeros(grid.shape_edges_z, dtype=bool)
    mx[:, 1:-1, 1:-1] = True
    my[1:-1, :, 1:-1] = True
    mz[1:-1, 1:-1, :] = True
    return np.concatenate([mx.ravel(), my.ravel(), mz.ravel()])


def alt_restrict(rx, ry, rz, grid, cgrid, wx, wy, wz):
    """Scalar-loop residual restriction, straight from Muld06 Eq. 8.

    Coarse x-edge (K+1/2, L, M) = sum_{jy,jz in {-1,0,1}} wy[L,jy] wz[M,jz]
    (rx[2K, 2L+jy, 2M+jz] + rx[2K+1, ...]), indices clamped at boundaries.
    Full coarsening only (oracle for the semicoarsening variants is the
    same code with the per-axis steps switched off).
    """
    def w3(w, i):
        wl, w0, wr = w
        return {-1: wl[i], 0: w0[i], 1: wr[i]}

    def clamp(i, n):
        return min(max(i, 0), n - 1)

    cshapes = [cgrid.shape_edges_x, cgrid.shape_edges_y, cgrid.shape_edges_z]
    crx = np.zeros(cshapes[0], dtype=rx.dtype)
    cry = np.zeros(cshapes[1], dtype=ry.dtype)
    crz = np.zeros(cshapes[2], dtype=rz.dtype)

    nny, nnz = rx.shape[1], rx.shape[2]
    nnx = ry.shape[0]

    for K in range(cshapes[0][0]):
        for L in range(cshapes[0][1]):
            for M in range(cshapes[0][2]):
                acc = 0.0
                for jy in (-1, 0, 1):
                    for jz in (-1, 0, 1):
                        iy = clamp(2 * L + jy, nny)
                        iz = clamp(2 * M + jz, nnz)
                        acc += (w3(wy, L)[jy] * w3(wz, M)[jz]
                                * (rx[2 * K, iy, iz] + rx[2 * K + 1, iy, iz]))
                crx[K, L, M] = acc

    for K in range(cshapes[1][0]):
        for L in range(cshapes[1][1]):
            for M in range(cshapes[1][2]):
                acc = 0.0
                for jx in (-1, 0, 1):
                    for jz in (-1, 0, 1):
                        ix = clamp(2 * K + jx, nnx)
                        iz = clamp(2 * M + jz, nnz)
                        acc += (w3(wx, K)[jx] * w3(wz, M)[jz]
                                * (ry[ix, 2 * L, iz] + ry[ix, 2 * L + 1, iz]))
                cry[K, L, M] = acc

    for K in range(cshapes[2][0]):
        for L in range(cshapes[2][1]):
            for M in range(cshapes[2][2]):
                acc = 0.0
                for jx in (-1, 0, 1):
                    for jy in (-1, 0, 1):
                        ix = clamp(2 * K + jx, nnx)
                        iy = clamp(2 * L + jy, nny)
                        acc += (w3(wx, K)[jx] * w3(wy, L)[jy]
                                * (rz[ix, iy, 2 * M] + rz[ix, iy, 2 * M + 1]))
                crz[K, L, M] = acc

    return crx, cry, crz


def alt_prolong(grid, cgrid, cex, cey, cez):
    """Slice-wise scipy bilinear prolongation (reference solver.py:947-1019).

    Bilinear in the transverse node planes, piecewise constant along the
    field direction, interior-only add (PEC preserved).
    """
    from scipy.interpolate import RegularGridInterpolator as RGI

    ex = np.zeros(grid.shape_edges_x, dtype=cex.dtype)
    ey = np.zeros(grid.shape_edges_y, dtype=cey.dtype)
    ez = np.zeros(grid.shape_edges_z, dtype=cez.dtype)

    yy, zz = np.meshgrid(grid.nodes_y, grid.nodes_z, indexing="ij")
    pts = np.stack([yy.ravel(), zz.ravel()], axis=1)
    for ixc in range(cgrid.shape_cells[0]):
        fn = RGI((cgrid.nodes_y, cgrid.nodes_z), cex[ixc], method="linear")
        hh = fn(pts).reshape(len(grid.nodes_y), len(grid.nodes_z))
        ex[2 * ixc, 1:-1, 1:-1] += hh[1:-1, 1:-1]
        ex[2 * ixc + 1, 1:-1, 1:-1] += hh[1:-1, 1:-1]

    xx, zz = np.meshgrid(grid.nodes_x, grid.nodes_z, indexing="ij")
    pts = np.stack([xx.ravel(), zz.ravel()], axis=1)
    for iyc in range(cgrid.shape_cells[1]):
        fn = RGI((cgrid.nodes_x, cgrid.nodes_z), cey[:, iyc, :],
                 method="linear")
        hh = fn(pts).reshape(len(grid.nodes_x), len(grid.nodes_z))
        ey[1:-1, 2 * iyc, 1:-1] += hh[1:-1, 1:-1]
        ey[1:-1, 2 * iyc + 1, 1:-1] += hh[1:-1, 1:-1]

    xx, yy = np.meshgrid(grid.nodes_x, grid.nodes_y, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel()], axis=1)
    for izc in range(cgrid.shape_cells[2]):
        fn = RGI((cgrid.nodes_x, cgrid.nodes_y), cez[:, :, izc],
                 method="linear")
        hh = fn(pts).reshape(len(grid.nodes_x), len(grid.nodes_y))
        ez[1:-1, 1:-1, 2 * izc] += hh[1:-1, 1:-1]
        ez[1:-1, 1:-1, 2 * izc + 1] += hh[1:-1, 1:-1]

    return ex, ey, ez


def field_to_cvec(field):
    """Field (Fortran-ordered 1-D storage) -> C-ordered [ex, ey, ez] vector
    matching the dense_matrix / interior_mask convention."""
    return np.concatenate([
        np.ascontiguousarray(field.fx).ravel(),
        np.ascontiguousarray(field.fy).ravel(),
        np.ascontiguousarray(field.fz).ravel()])


def fullspace_dipole_time(points, src, time, resistivity, signal=1):
    """Analytical transient E-field of an x-directed dipole in a fullspace.

    Closed-form inverse Laplace transform of :func:`fullspace_dipole`
    (Ward & Hohmann 1988, transient wholespace dipole).  With
    theta = r sqrt(mu0 sigma / (4 t)) and P = (rh.x)rh:

      E_on(t)  = 1/(4 pi sigma r^3) [ P (4θ³+6θ)/√π e^{-θ²} + 3P erfc(θ)
                                     - x ((4θ³+2θ)/√π e^{-θ²} + erfc(θ)) ]
      E_off(t) = E_DC - E_on(t),  E_DC = (3P - x)/(4 pi sigma r^3)

    signal: +1 switch-on, -1 switch-off.  Returns (nt, n, 3).
    """
    from scipy import special

    sigma = 1.0 / resistivity
    points = np.atleast_2d(points)
    time = np.atleast_1d(time)

    rvec = points - np.asarray(src)[None, :]
    r = np.linalg.norm(rvec, axis=1)
    rh = rvec / r[:, None]
    x = np.array([1.0, 0.0, 0.0])

    theta = r[None, :] * np.sqrt(const.mu_0 * sigma / (4 * time[:, None]))
    e = np.exp(-theta ** 2) / np.sqrt(np.pi)
    erfc = special.erfc(theta)

    cP = (4 * theta ** 3 + 6 * theta) * e + 3 * erfc     # (nt, n)
    cX = (4 * theta ** 3 + 2 * theta) * e + erfc

    P = (rh @ x)[:, None] * rh                           # (n, 3)
    fac = 1.0 / (4 * np.pi * sigma * r ** 3)             # (n,)

    e_on = fac[None, :, None] * (
        cP[:, :, None] * P[None] - cX[:, :, None] * x[None, None])

    if signal == 1:
        return e_on
    e_dc = fac[:, None] * (3 * P - x[None, :])
    return e_dc[None] - e_on
