"""Inter-grid transfer operators: restriction and prolongation (TPU-native).

The reference implements restriction as seven hand-unrolled scalar-loop
variants for the semicoarsening directions (``restrict``,
emg3d/core.py:1620-2001) and prolongation as per-slice 2-D bilinear
interpolation (solver.py:947-1019).  Both operators are *separable*:
per grid axis they are either

- identity                      (axis not coarsened),
- pairwise sum of the two children cells      (the component's own axis),
- a 3-point weighted nodal gather (wl, 1, wr)  (transverse axes), or
- for prolongation: 2-point linear nodal interpolation / cell duplication.

Expressing them as chained 1-D gathers turns all seven sc_dir variants
into one code path that XLA fuses into a handful of vectorized kernels.

The operator-dependent weights (Muld06 Eq. 9 with the [MoSu94] boundary
scheme; reference ``restrict_weights``, core.py:2004-2076) are tiny 1-D
host-side computations, precomputed per multigrid level.
"""

import jax.numpy as jnp
import numpy as np

__all__ = ["restrict_weights", "restrict", "prolong_meta", "prolong",
           "restrict_model_parameters"]


def restrict_weights(nodes, cell_centers, h, cnodes, ccell_centers, ch):
    """1-D restriction weights (wl, w0, wr) for one coarsened axis.

    Host-side numpy; vectorized version of reference core.py:2004-2076.
    """
    n = len(cnodes)

    d = np.empty(n + 1)
    d[0] = h[0] / 2
    d[-1] = h[-1] / 2
    if n > 1:
        d[1:n] = (h[0:2 * n - 2:2] + h[1:2 * n - 1:2]) / 2

    wl = 1 / d[:-1]
    wl[0] *= (nodes[0] - h[0] / 2) - (cnodes[0] - ch[0] / 2)
    if n > 1:
        wl[1:] *= cell_centers[1:2 * n - 1:2] - ccell_centers[: n - 1]

    w0 = np.ones(n)

    wr = 1 / d[1:]
    wr[-1] *= (cnodes[-1] + ch[-1] / 2) - (nodes[-1] + h[-1] / 2)
    if n > 1:
        wr[:-1] *= ccell_centers[: n - 1] - cell_centers[0:2 * n - 2:2]

    return wl, w0, wr


def _nodal_gather(r, axis, wl, w0, wr):
    """Weighted 3-point nodal restriction along ``axis``.

    Coarse node L gathers fine nodes (2L-1, 2L, 2L+1), clamped at the
    boundaries, with weights (wl[L], w0[L], wr[L]).
    """
    n_f = r.shape[axis]
    n_c = wl.shape[0]
    idx0 = jnp.arange(n_c) * 2
    idx_m = jnp.maximum(idx0 - 1, 0)
    idx_p = jnp.minimum(idx0 + 1, n_f - 1)

    def bcast(w):
        shape = [1, 1, 1]
        shape[axis] = n_c
        return jnp.asarray(w).reshape(shape)

    return (bcast(wl) * jnp.take(r, idx_m, axis=axis)
            + bcast(w0) * jnp.take(r, idx0, axis=axis)
            + bcast(wr) * jnp.take(r, idx_p, axis=axis))


def _pair_sum(r, axis):
    """Sum of the two fine children cells along the component's own axis."""
    n = r.shape[axis]
    even = jnp.take(r, jnp.arange(0, n, 2), axis=axis)
    odd = jnp.take(r, jnp.arange(1, n, 2), axis=axis)
    return even + odd


def restrict(rx, ry, rz, weights, coarsen):
    """Restrict the fine-grid residual to the coarse grid.

    Parameters
    ----------
    rx, ry, rz : jnp.ndarray
        Fine-grid residual components (edge shapes).
    weights : ((wl, w0, wr), ...) per axis
        From :func:`restrict_weights`; only used on coarsened axes.
    coarsen : (bool, bool, bool), static
        Which axes are coarsened (all True for full coarsening; the
        semicoarsening variants of reference core.py:1671-2001 are the
        other combinations).
    """
    def comp(r, own):
        for axis in range(3):
            if not coarsen[axis]:
                continue
            if axis == own:
                r = _pair_sum(r, axis)
            else:
                r = _nodal_gather(r, axis, *weights[axis])
        return r

    return comp(rx, 0), comp(ry, 1), comp(rz, 2)


def restrict_model_parameters(param, coarsen):
    """Coarse model parameter: sum of the 2/4/8 children cells.

    Host- or device-side; mirrors reference solver.py:1667-1718.
    """
    for axis in range(3):
        if coarsen[axis]:
            sl_even = [slice(None)] * 3
            sl_odd = [slice(None)] * 3
            sl_even[axis] = slice(0, None, 2)
            sl_odd[axis] = slice(1, None, 2)
            param = param[tuple(sl_even)] + param[tuple(sl_odd)]
    return param


def prolong_meta(cnodes, fnodes):
    """1-D linear-interpolation metadata (idx, weight) coarse -> fine nodes.

    Equivalent to the weight computation of RegularGridProlongator
    (reference solver.py:1385-1478): fine node value =
    (1-w) * coarse[idx] + w * coarse[idx+1], with clamped extrapolation.
    Host-side numpy.
    """
    idx = np.clip(np.searchsorted(cnodes, fnodes) - 1, 0, cnodes.size - 2)
    w = (fnodes - cnodes[idx]) / (cnodes[idx + 1] - cnodes[idx])
    return idx.astype(np.int32), w


def _nodal_prolong(c, axis, idx, w):
    """Linear nodal interpolation along ``axis`` using precomputed meta."""
    shape = [1, 1, 1]
    shape[axis] = idx.shape[0]
    w = jnp.asarray(w).reshape(shape)
    lo = jnp.take(c, jnp.asarray(idx), axis=axis)
    hi = jnp.take(c, jnp.asarray(idx) + 1, axis=axis)
    return (1.0 - w) * lo + w * hi


def _duplicate(c, axis):
    """Piecewise-constant prolongation along the component's own axis."""
    return jnp.repeat(c, 2, axis=axis)


def prolong(ex, ey, ez, cex, cey, cez, pmeta, coarsen):
    """Add the prolonged coarse-grid correction to the fine field.

    Bilinear in the transverse directions, piecewise constant along the
    field direction; only interior (non-PEC) fine edges are updated
    (reference solver.py:947-1019).

    ``pmeta`` holds per-axis (idx, w) from :func:`prolong_meta` for the
    coarsened axes (ignored otherwise).
    """
    def comp(e, c, own):
        for axis in range(3):
            if not coarsen[axis]:
                continue
            if axis == own:
                c = _duplicate(c, axis)
            else:
                c = _nodal_prolong(c, axis, *pmeta[axis])

        # Interior-only add (PEC preserved).
        sl = [slice(None)] * 3
        for axis in range(3):
            if axis != own:
                sl[axis] = slice(1, -1)
        sl = tuple(sl)
        return e.at[sl].add(c[sl])

    return (comp(ex, cex, 0), comp(ey, cey, 1), comp(ez, cez, 2))
