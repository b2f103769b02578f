"""Split-real Gauss-Seidel phase: the Pallas TPU kernel path.

TPU Pallas (Mosaic) has no complex dtypes, so the point-smoother phase
is reformulated on (re, im) float pairs.  The same arithmetic core
serves two callers:

- :func:`gauss_seidel_phase_split` — a pure jax.numpy function used to
  validate the split arithmetic against the complex implementation
  (:func:`emg3d_tpu.ops.smoothers.gauss_seidel_phase`) on any backend;
- :func:`gauss_seidel_phase_pallas` — a ``pl.pallas_call`` wrapper
  whose kernel body is the same core reading/writing VMEM refs
  (whole-phase v1: all arrays resident in VMEM; fine for the coarse
  and mid multigrid levels, the fine-level tiled variant comes with
  hardware profiling).

Structure of the per-node 6x6 system (reference core.py:392-492): the
curl-curl couplings are REAL (averaged zeta x inverse widths), only
the diagonal carries the complex -eta/4 term, and the right-hand-side
gathers multiply real coefficients with complex fields — so re and im
parts of the rhs decouple and the only re/im mixing happens inside the
6x6 solve.
"""

import jax
import jax.numpy as jnp

from emg3d_tpu.ops.smoothers import _m_coefficients

__all__ = ["gauss_seidel_phase_split", "gauss_seidel_phase_pallas"]


def __dir__():
    return __all__


# -------------------------------------------------------------------------
# Complex-pair arithmetic on (re, im) tuples of real arrays.
# -------------------------------------------------------------------------

def _cadd(a, b):
    return a[0] + b[0], a[1] + b[1]


def _csub(a, b):
    return a[0] - b[0], a[1] - b[1]


def _cmul(a, b):
    return a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0]


def _cdiv(a, b):
    den = b[0] * b[0] + b[1] * b[1]
    return ((a[0] * b[0] + a[1] * b[1]) / den,
            (a[1] * b[0] - a[0] * b[1]) / den)


def _cscale(a, r):
    """pair * real."""
    return a[0] * r, a[1] * r


def _solve6_split(rows, rhs):
    """Unrolled 6x6 Gaussian elimination on complex pairs (no pivoting).

    ``rows[i]``: pair of (..., 6) arrays; ``rhs[i]``: pair of (...,).
    Mirrors smoothers._solve_lower_unrolled on split representation.
    """
    n = 6
    rows = list(rows)
    rhs = list(rhs)

    for k in range(n):
        piv = (rows[k][0][..., k], rows[k][1][..., k])
        for i in range(k + 1, n):
            f = _cdiv((rows[i][0][..., k], rows[i][1][..., k]), piv)
            rows[i] = _csub(rows[i], (f[0][..., None] * rows[k][0]
                                      - f[1][..., None] * rows[k][1],
                                      f[0][..., None] * rows[k][1]
                                      + f[1][..., None] * rows[k][0]))
            rhs[i] = _csub(rhs[i], _cmul(f, rhs[k]))

    x = [None] * n
    for i in range(n - 1, -1, -1):
        acc = rhs[i]
        for j in range(i + 1, n):
            acc = _csub(acc, _cmul((rows[i][0][..., j],
                                    rows[i][1][..., j]), x[j]))
        x[i] = _cdiv(acc, (rows[i][0][..., i], rows[i][1][..., i]))
    return x


# -------------------------------------------------------------------------
# The split-real phase core.
# -------------------------------------------------------------------------

def _phase_core(exr, exi, eyr, eyi, ezr, ezi,
                sxr, sxi, syr, syi, szr, szi,
                etaxr, etaxi, etayr, etayi, etazr, etazi,
                zeta, hx, hy, hz, px, py, pz):
    """One 8-color phase on split fields; returns the 6 updated arrays.

    Identical math to smoothers.gauss_seidel_phase (reference
    core.py:392-492), with complex values carried as (re, im) pairs.
    """
    nx, ny, nz = hx.size, hy.size, hz.size

    kx, ky, kz = 0.5 / hx, 0.5 / hy, 0.5 / hz
    ihx, ihy, ihz = 1.0 / hx, 1.0 / hy, 1.0 / hz

    def csl(o, n, p):
        return slice(o + p, n - 1 + o, 2)

    def nsl(d, n, p):
        return slice(1 + d + p, n + d, 2)

    xa, xb = csl(0, nx, px), csl(1, nx, px)
    ym, yp = csl(0, ny, py), csl(1, ny, py)
    zm, zp = csl(0, nz, pz), csl(1, nz, pz)

    kxa = kx[xa][:, None, None]
    kxb = kx[xb][:, None, None]
    kym = ky[ym][None, :, None]
    kyp = ky[yp][None, :, None]
    kzm = kz[zm][None, None, :]
    kzp = kz[zp][None, None, :]
    ihxa = ihx[xa][:, None, None]
    ihxb = ihx[xb][:, None, None]
    ihym = ihy[ym][None, :, None]
    ihyp = ihy[yp][None, :, None]
    ihzm = ihz[zm][None, None, :]
    ihzp = ihz[zp][None, None, :]

    z = {}
    for xk, xs in (("a", xa), ("b", xb)):
        z[xk + "mm"] = zeta[xs, ym, zm]
        z[xk + "mp"] = zeta[xs, ym, zp]
        z[xk + "pm"] = zeta[xs, yp, zm]
        z[xk + "pp"] = zeta[xs, yp, zp]
    m = _m_coefficients(z, kxa, kxb, kym, kyp, kzm, kzp)

    def st(eta, ax, xs):
        out = 0.0
        n_ = (nx, ny, nz)
        p_ = (px, py, pz)
        others = [i for i in range(3) if i != ax]
        for d1 in (0, 1):
            for d2 in (0, 1):
                idx = [None, None, None]
                idx[ax] = xs
                idx[others[0]] = csl(d1, n_[others[0]], p_[others[0]])
                idx[others[1]] = csl(d2, n_[others[1]], p_[others[1]])
                out = out + eta[tuple(idx)]
        return out / 4.0

    st0 = (st(etaxr, 0, xa), st(etaxi, 0, xa))
    st1 = (st(etaxr, 0, xb), st(etaxi, 0, xb))
    st2 = (st(etayr, 1, ym), st(etayi, 1, ym))
    st3 = (st(etayr, 1, yp), st(etayi, 1, yp))
    st4 = (st(etazr, 2, zm), st(etazi, 2, zm))
    st5 = (st(etazr, 2, zp), st(etazi, 2, zp))

    # Real curl-curl parts of the 6 diagonals; complex via -st.
    d00 = (m["zyRxm"] * ihyp + m["zyLxm"] * ihym
           + m["yzRxm"] * ihzp + m["yzLxm"] * ihzm)
    d11 = (m["zyRxp"] * ihyp + m["zyLxp"] * ihym
           + m["yzRxp"] * ihzp + m["yzLxp"] * ihzm)
    d22 = (m["zxRym"] * ihxb + m["zxLym"] * ihxa
           + m["xzRym"] * ihzp + m["xzLym"] * ihzm)
    d33 = (m["zxRyp"] * ihxb + m["zxLyp"] * ihxa
           + m["xzRyp"] * ihzp + m["xzLyp"] * ihzm)
    d44 = (m["yxRzm"] * ihxb + m["yxLzm"] * ihxa
           + m["xyRzm"] * ihyp + m["xyLzm"] * ihym)
    d55 = (m["yxRzp"] * ihxb + m["yxLzp"] * ihxa
           + m["xyRzp"] * ihyp + m["xyLzp"] * ihym)

    a00 = (d00 - st0[0], -st0[1])
    a11 = (d11 - st1[0], -st1[1])
    a22 = (d22 - st2[0], -st2[1])
    a33 = (d33 - st3[0], -st3[1])
    a44 = (d44 - st4[0], -st4[1])
    a55 = (d55 - st5[0], -st5[1])

    # Real off-diagonal couplings (averaged zeta x inverse widths).
    a20 = -m["zyLxm"] * ihxa
    a30 = m["zyRxm"] * ihxa
    a40 = -m["yzLxm"] * ihxa
    a50 = m["yzRxm"] * ihxa
    a21 = m["zyLxp"] * ihxb
    a31 = -m["zyRxp"] * ihxb
    a41 = m["yzLxp"] * ihxb
    a51 = -m["yzRxp"] * ihxb
    a42 = -m["xzLym"] * ihym
    a52 = m["xzRym"] * ihym
    a43 = m["xzLyp"] * ihyp
    a53 = -m["xzRyp"] * ihyp

    blk = jnp.broadcast_shapes(a00[0].shape, a20.shape)
    rdt = zeta.dtype
    zero = jnp.zeros(blk, dtype=rdt)

    def bz(v):
        return jnp.broadcast_to(v, blk).astype(rdt)

    def row(entries):
        re = jnp.stack([bz(e[0]) if isinstance(e, tuple) else bz(e)
                        for e in entries], axis=-1)
        im = jnp.stack([bz(e[1]) if isinstance(e, tuple) else zero
                        for e in entries], axis=-1)
        return re, im

    rows = [
        row([a00, zero, a20, a30, a40, a50]),
        row([zero, a11, a21, a31, a41, a51]),
        row([a20, a21, a22, zero, a42, a52]),
        row([a30, a31, zero, a33, a43, a53]),
        row([a40, a41, a42, a43, a44, zero]),
        row([a50, a51, a52, a53, zero, a55]),
    ]

    mb = {k: bz(v) for k, v in m.items()}

    def gex(f, o, dy, dz):
        return f[csl(o, nx, px), nsl(dy, ny, py), nsl(dz, nz, pz)]

    def gey(f, dx, o, dz):
        return f[nsl(dx, nx, px), csl(o, ny, py), nsl(dz, nz, pz)]

    def gez(f, dx, dy, o):
        return f[nsl(dx, nx, px), nsl(dy, ny, py), csl(o, nz, pz)]

    def rhs_of(ex, ey, ez, sx, sy, sz):
        """rhs gathers (reference core.py:432-492) — real coefficients
        times one real part of the fields, so re/im fully decouple."""
        r0 = (gex(sx, 0, 0, 0)
              + mb["zyRxm"] * (gey(ey, -1, 1, 0) * ihxa
                               + gex(ex, 0, 1, 0) * ihyp)
              + mb["zyLxm"] * (-gey(ey, -1, 0, 0) * ihxa
                               + gex(ex, 0, -1, 0) * ihym)
              + mb["yzRxm"] * (gez(ez, -1, 0, 1) * ihxa
                               + gex(ex, 0, 0, 1) * ihzp)
              + mb["yzLxm"] * (-gez(ez, -1, 0, 0) * ihxa
                               + gex(ex, 0, 0, -1) * ihzm))
        r1 = (gex(sx, 1, 0, 0)
              + mb["zyRxp"] * (-gey(ey, 1, 1, 0) * ihxb
                               + gex(ex, 1, 1, 0) * ihyp)
              + mb["zyLxp"] * (gey(ey, 1, 0, 0) * ihxb
                               + gex(ex, 1, -1, 0) * ihym)
              + mb["yzRxp"] * (-gez(ez, 1, 0, 1) * ihxb
                               + gex(ex, 1, 0, 1) * ihzp)
              + mb["yzLxp"] * (gez(ez, 1, 0, 0) * ihxb
                               + gex(ex, 1, 0, -1) * ihzm))
        r2 = (gey(sy, 0, 0, 0)
              + mb["zxRym"] * (gey(ey, 1, 0, 0) * ihxb
                               + gex(ex, 1, -1, 0) * ihym)
              + mb["zxLym"] * (gey(ey, -1, 0, 0) * ihxa
                               - gex(ex, 0, -1, 0) * ihym)
              + mb["xzRym"] * (gez(ez, 0, -1, 1) * ihym
                               + gey(ey, 0, 0, 1) * ihzp)
              + mb["xzLym"] * (-gez(ez, 0, -1, 0) * ihym
                               + gey(ey, 0, 0, -1) * ihzm))
        r3 = (gey(sy, 0, 1, 0)
              + mb["zxRyp"] * (gey(ey, 1, 1, 0) * ihxb
                               - gex(ex, 1, 1, 0) * ihyp)
              + mb["zxLyp"] * (gey(ey, -1, 1, 0) * ihxa
                               + gex(ex, 0, 1, 0) * ihyp)
              + mb["xzRyp"] * (-gez(ez, 0, 1, 1) * ihyp
                               + gey(ey, 0, 1, 1) * ihzp)
              + mb["xzLyp"] * (gez(ez, 0, 1, 0) * ihyp
                               + gey(ey, 0, 1, -1) * ihzm))
        r4 = (gez(sz, 0, 0, 0)
              + mb["yxRzm"] * (gez(ez, 1, 0, 0) * ihxb
                               + gex(ex, 1, 0, -1) * ihzm)
              + mb["yxLzm"] * (gez(ez, -1, 0, 0) * ihxa
                               - gex(ex, 0, 0, -1) * ihzm)
              + mb["xyRzm"] * (gez(ez, 0, 1, 0) * ihyp
                               + gey(ey, 0, 1, -1) * ihzm)
              + mb["xyLzm"] * (gez(ez, 0, -1, 0) * ihym
                               - gey(ey, 0, 0, -1) * ihzm))
        r5 = (gez(sz, 0, 0, 1)
              + mb["yxRzp"] * (gez(ez, 1, 0, 1) * ihxb
                               - gex(ex, 1, 0, 1) * ihzp)
              + mb["yxLzp"] * (gez(ez, -1, 0, 1) * ihxa
                               + gex(ex, 0, 0, 1) * ihzp)
              + mb["xyRzp"] * (gez(ez, 0, 1, 1) * ihyp
                               - gey(ey, 0, 1, 1) * ihzp)
              + mb["xyLzp"] * (gez(ez, 0, -1, 1) * ihym
                               + gey(ey, 0, 0, 1) * ihzp))
        return r0, r1, r2, r3, r4, r5

    rr = rhs_of(exr, eyr, ezr, sxr, syr, szr)
    ri = rhs_of(exi, eyi, ezi, sxi, syi, szi)
    rhs = [(jnp.broadcast_to(a, blk), jnp.broadcast_to(b, blk))
           for a, b in zip(rr, ri)]

    sol = _solve6_split(rows, rhs)

    def put(f, sl, v):
        return f.at[sl].set(v)

    slx0 = (csl(0, nx, px), nsl(0, ny, py), nsl(0, nz, pz))
    slx1 = (csl(1, nx, px), nsl(0, ny, py), nsl(0, nz, pz))
    sly0 = (nsl(0, nx, px), csl(0, ny, py), nsl(0, nz, pz))
    sly1 = (nsl(0, nx, px), csl(1, ny, py), nsl(0, nz, pz))
    slz0 = (nsl(0, nx, px), nsl(0, ny, py), csl(0, nz, pz))
    slz1 = (nsl(0, nx, px), nsl(0, ny, py), csl(1, nz, pz))

    exr = put(put(exr, slx0, sol[0][0]), slx1, sol[1][0])
    exi = put(put(exi, slx0, sol[0][1]), slx1, sol[1][1])
    eyr = put(put(eyr, sly0, sol[2][0]), sly1, sol[3][0])
    eyi = put(put(eyi, sly0, sol[2][1]), sly1, sol[3][1])
    ezr = put(put(ezr, slz0, sol[4][0]), slz1, sol[5][0])
    ezi = put(put(ezi, slz0, sol[4][1]), slz1, sol[5][1])
    return exr, exi, eyr, eyi, ezr, ezi


def gauss_seidel_phase_split(ex, ey, ez, sx, sy, sz, eta_x, eta_y,
                             eta_z, zeta, hx, hy, hz, px, py, pz):
    """Complex-in/complex-out wrapper over the split-real phase core.

    Equivalent to smoothers.gauss_seidel_phase; exists to validate the
    split arithmetic (and as the non-pallas fallback of the split
    path).
    """
    parts = []
    for f in (ex, ey, ez, sx, sy, sz):
        parts += [jnp.real(f), jnp.imag(f)]
    etas = []
    for f in (eta_x, eta_y, eta_z):
        etas += [jnp.real(f), jnp.imag(f)]
    out = _phase_core(*parts[:12], *etas, zeta, hx, hy, hz, px, py, pz)
    return (out[0] + 1j * out[1], out[2] + 1j * out[3],
            out[4] + 1j * out[5])


def gauss_seidel_phase_pallas(ex, ey, ez, sx, sy, sz, eta_x, eta_y,
                              eta_z, zeta, hx, hy, hz, px, py, pz,
                              interpret=False):
    """Whole-phase Pallas kernel (v1: all arrays VMEM-resident).

    Complex inputs are split to (re, im) float planes outside the
    kernel; the body runs :func:`_phase_core` on VMEM refs.  Suitable
    for levels whose working set fits VMEM (~16 MB); the fine-level
    tiled/double-buffered variant is planned against hardware profiles.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fields12 = []
    for f in (ex, ey, ez, sx, sy, sz):
        fields12 += [jnp.real(f), jnp.imag(f)]
    etas6 = []
    for f in (eta_x, eta_y, eta_z):
        etas6 += [jnp.real(f), jnp.imag(f)]

    n_in = len(fields12) + len(etas6) + 4        # + zeta, hx, hy, hz

    def kernel(*refs):
        ins = [r[...] for r in refs[:n_in]]
        outs = refs[n_in:]
        res = _phase_core(*ins[:12], *ins[12:18], ins[18],
                          ins[19], ins[20], ins[21], px, py, pz)
        for o_ref, val in zip(outs, res):
            o_ref[...] = val

    out_shape = [jax.ShapeDtypeStruct(f.shape, f.dtype)
                 for f in fields12[:6]]
    spec = pl.BlockSpec(memory_space=pltpu.ANY if interpret
                        else pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[spec] * n_in,
        out_specs=[spec] * 6,
        interpret=interpret,
    )(*fields12, *etas6, zeta, hx, hy, hz)

    return (out[0] + 1j * out[1], out[2] + 1j * out[3],
            out[4] + 1j * out[5])
