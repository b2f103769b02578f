"""Split-real Gauss-Seidel phase: the Pallas TPU kernel path.

TPU Pallas (Mosaic) has no complex dtypes, so the point-smoother phase
is reformulated on (re, im) float pairs.  The same arithmetic core
serves three callers:

- :func:`gauss_seidel_phase_split` — a pure jax.numpy function used to
  validate the split arithmetic against the complex implementation
  (:func:`emg3d_tpu.ops.smoothers.gauss_seidel_phase`) on any backend;
- :func:`gauss_seidel_phase_pallas` — a whole-phase ``pl.pallas_call``
  (v1: all arrays VMEM-resident) for levels whose working set fits
  VMEM (~16 MB) — the coarse and mid multigrid levels;
- :func:`gauss_seidel_phase_pallas_tiled` — the fine-level kernel:
  the phase block is tiled over (x, y) with z kept whole, and each
  tile's input windows are streamed HBM→VMEM with double-buffered
  async DMA (compute on tile t overlaps the fetch of tile t+1 and the
  writeback of tile t−1).  This is the kernel for 64³+ grids where the
  whole-phase working set (~22 f32 planes) exceeds VMEM.

Structure of the per-node 6x6 system (reference core.py:392-492): the
curl-curl couplings are REAL (averaged zeta x inverse widths), only
the diagonal carries the complex -eta/4 term, and the right-hand-side
gathers multiply real coefficients with complex fields — so re and im
parts of the rhs decouple and the only re/im mixing happens inside the
6x6 solve.  The 6x6 elimination is carried on UNSTACKED (re, im) pairs
of phase-block arrays (not a trailing length-6 axis): every operation
stays elementwise over the block with z on the lane dimension, which
is the layout Mosaic vectorizes well; structural zeros of the stencil
are folded away at trace time.

Tiling algebra (why tiles are self-contained): for phase parity
(px, py, pz), block b along x touches array planes px+2b .. px+2b+2
only, so a tile of T consecutive blocks needs a STATIC window of
2T (+1 for node-type arrays) planes starting at px+2b0 — and the
window's local parity is always (0, 0, pz).  Updated planes are
interior to the window (halo planes are never written with new
values), so full-window writebacks and halo overlaps between
neighbouring tiles are race-free by value, and ragged edges are
handled by overlap-recompute (b0 = min(i*T, ncx-T)): re-computed
blocks produce byte-identical values because a phase never reads the
positions it updates (8-color decoupling).
"""

import os

import jax
import jax.numpy as jnp

from emg3d_tpu.ops.smoothers import _m_coefficients

__all__ = ["gauss_seidel_phase_split", "gauss_seidel_phase_pallas",
           "gauss_seidel_phase_pallas_tiled", "use_tiled"]


def __dir__():
    return __all__


# -------------------------------------------------------------------------
# Complex-pair arithmetic on (re, im) tuples with trace-time zero folding.
# -------------------------------------------------------------------------

def _is0(v):
    """Structural (trace-time) zero."""
    return isinstance(v, (int, float)) and v == 0.0


def _radd(x, y):
    if _is0(x):
        return y
    if _is0(y):
        return x
    return x + y


def _rsub(x, y):
    if _is0(y):
        return x
    if _is0(x):
        return -y
    return x - y


def _rmul(x, y):
    if _is0(x) or _is0(y):
        return 0.0
    return x * y


def _rdiv(x, y):
    if _is0(x):
        return 0.0
    return x / y


def _p_add(a, b):
    return _radd(a[0], b[0]), _radd(a[1], b[1])


def _p_sub(a, b):
    return _rsub(a[0], b[0]), _rsub(a[1], b[1])


def _p_mul(a, b):
    return (_rsub(_rmul(a[0], b[0]), _rmul(a[1], b[1])),
            _radd(_rmul(a[0], b[1]), _rmul(a[1], b[0])))


def _p_div(a, b):
    den = _radd(_rmul(b[0], b[0]), _rmul(b[1], b[1]))
    return (_rdiv(_radd(_rmul(a[0], b[0]), _rmul(a[1], b[1])), den),
            _rdiv(_rsub(_rmul(a[1], b[0]), _rmul(a[0], b[1])), den))


def _p_zero(p):
    return _is0(p[0]) and _is0(p[1])


def _solve6_pairs(mat, rhs):
    """Unrolled 6x6 Gaussian elimination on complex pairs (no pivoting).

    ``mat``: 6x6 list of (re, im) pairs over the phase block (entries
    may be the structural zero ``(0.0, 0.0)``, skipped at trace time);
    ``rhs``: 6 pairs.  No trailing length-6 stacking — every operation
    is elementwise over the block, the Mosaic-friendly layout.
    """
    n = 6
    mat = [row[:] for row in mat]
    rhs = list(rhs)

    for k in range(n):
        piv = mat[k][k]
        for i in range(k + 1, n):
            if _p_zero(mat[i][k]):
                continue
            f = _p_div(mat[i][k], piv)
            for j in range(k + 1, n):
                if _p_zero(mat[k][j]):
                    continue
                mat[i][j] = _p_sub(mat[i][j], _p_mul(f, mat[k][j]))
            rhs[i] = _p_sub(rhs[i], _p_mul(f, rhs[k]))

    x = [None] * n
    for i in range(n - 1, -1, -1):
        acc = rhs[i]
        for j in range(i + 1, n):
            if _p_zero(mat[i][j]):
                continue
            acc = _p_sub(acc, _p_mul(mat[i][j], x[j]))
        x[i] = _p_div(acc, mat[i][i])
    return x


# -------------------------------------------------------------------------
# The split-real phase core.
# -------------------------------------------------------------------------

def _csl(o, n, p):
    """Cell-type slice at the phase nodes: o in {0, 1}."""
    return slice(o + p, n - 1 + o, 2)


def _nsl(d, n, p):
    """Node-type slice: d in {-1, 0, 1}."""
    return slice(1 + d + p, n + d, 2)


def _phase_coeffs(hx, hy, hz, dims, parity):
    """The 12 broadcastable width-coefficient slices of one phase."""
    nx, ny, nz = dims
    px, py, pz = parity
    kx, ky, kz = 0.5 / hx, 0.5 / hy, 0.5 / hz
    ihx, ihy, ihz = 1.0 / hx, 1.0 / hy, 1.0 / hz
    xa, xb = _csl(0, nx, px), _csl(1, nx, px)
    ym, yp = _csl(0, ny, py), _csl(1, ny, py)
    zm, zp = _csl(0, nz, pz), _csl(1, nz, pz)
    return {
        "kxa": kx[xa][:, None, None], "kxb": kx[xb][:, None, None],
        "kym": ky[ym][None, :, None], "kyp": ky[yp][None, :, None],
        "kzm": kz[zm][None, None, :], "kzp": kz[zp][None, None, :],
        "ihxa": ihx[xa][:, None, None], "ihxb": ihx[xb][:, None, None],
        "ihym": ihy[ym][None, :, None], "ihyp": ihy[yp][None, :, None],
        "ihzm": ihz[zm][None, None, :], "ihzp": ihz[zp][None, None, :],
    }


def _phase_core(exr, exi, eyr, eyi, ezr, ezi,
                sxr, sxi, syr, syi, szr, szi,
                etaxr, etaxi, etayr, etayi, etazr, etazi,
                zeta, hx, hy, hz, px, py, pz):
    """One 8-color phase on split fields; returns the 6 updated arrays.

    Identical math to smoothers.gauss_seidel_phase (reference
    core.py:392-492), with complex values carried as (re, im) pairs.
    """
    dims = (hx.size, hy.size, hz.size)
    parity = (px, py, pz)
    co = _phase_coeffs(hx, hy, hz, dims, parity)
    return _phase_core_coeffs(
        exr, exi, eyr, eyi, ezr, ezi, sxr, sxi, syr, syi, szr, szi,
        etaxr, etaxi, etayr, etayi, etazr, etazi, zeta, co, dims, parity)


def _phase_core_coeffs(exr, exi, eyr, eyi, ezr, ezi,
                       sxr, sxi, syr, syi, szr, szi,
                       etaxr, etaxi, etayr, etayi, etazr, etazi,
                       zeta, co, dims, parity):
    """Phase body on precomputed width coefficients (``co``).

    ``dims``/``parity`` are the (local) cell counts and phase parity —
    the tiled kernel calls this on VMEM windows with parity (0, 0, pz).
    """
    nx, ny, nz = dims
    px, py, pz = parity

    xa, xb = _csl(0, nx, px), _csl(1, nx, px)
    ym, yp = _csl(0, ny, py), _csl(1, ny, py)
    zm, zp = _csl(0, nz, pz), _csl(1, nz, pz)

    ihxa, ihxb = co["ihxa"], co["ihxb"]
    ihym, ihyp = co["ihym"], co["ihyp"]
    ihzm, ihzp = co["ihzm"], co["ihzp"]

    z = {}
    for xk, xs in (("a", xa), ("b", xb)):
        z[xk + "mm"] = zeta[xs, ym, zm]
        z[xk + "mp"] = zeta[xs, ym, zp]
        z[xk + "pm"] = zeta[xs, yp, zm]
        z[xk + "pp"] = zeta[xs, yp, zp]
    m = _m_coefficients(z, co["kxa"], co["kxb"], co["kym"], co["kyp"],
                        co["kzm"], co["kzp"])

    def st(eta, ax, xs):
        out = 0.0
        n_ = (nx, ny, nz)
        p_ = (px, py, pz)
        others = [i for i in range(3) if i != ax]
        for d1 in (0, 1):
            for d2 in (0, 1):
                idx = [None, None, None]
                idx[ax] = xs
                idx[others[0]] = _csl(d1, n_[others[0]], p_[others[0]])
                idx[others[1]] = _csl(d2, n_[others[1]], p_[others[1]])
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

    def gex(f, o, dy, dz):
        return f[_csl(o, nx, px), _nsl(dy, ny, py), _nsl(dz, nz, pz)]

    def gey(f, dx, o, dz):
        return f[_nsl(dx, nx, px), _csl(o, ny, py), _nsl(dz, nz, pz)]

    def gez(f, dx, dy, o):
        return f[_nsl(dx, nx, px), _nsl(dy, ny, py), _csl(o, nz, pz)]

    def rhs_of(ex, ey, ez, sx, sy, sz):
        """rhs gathers (reference core.py:432-492) — real coefficients
        times one real part of the fields, so re/im fully decouple."""
        r0 = (gex(sx, 0, 0, 0)
              + m["zyRxm"] * (gey(ey, -1, 1, 0) * ihxa
                              + gex(ex, 0, 1, 0) * ihyp)
              + m["zyLxm"] * (-gey(ey, -1, 0, 0) * ihxa
                              + gex(ex, 0, -1, 0) * ihym)
              + m["yzRxm"] * (gez(ez, -1, 0, 1) * ihxa
                              + gex(ex, 0, 0, 1) * ihzp)
              + m["yzLxm"] * (-gez(ez, -1, 0, 0) * ihxa
                              + gex(ex, 0, 0, -1) * ihzm))
        r1 = (gex(sx, 1, 0, 0)
              + m["zyRxp"] * (-gey(ey, 1, 1, 0) * ihxb
                              + gex(ex, 1, 1, 0) * ihyp)
              + m["zyLxp"] * (gey(ey, 1, 0, 0) * ihxb
                              + gex(ex, 1, -1, 0) * ihym)
              + m["yzRxp"] * (-gez(ez, 1, 0, 1) * ihxb
                              + gex(ex, 1, 0, 1) * ihzp)
              + m["yzLxp"] * (gez(ez, 1, 0, 0) * ihxb
                              + gex(ex, 1, 0, -1) * ihzm))
        r2 = (gey(sy, 0, 0, 0)
              + m["zxRym"] * (gey(ey, 1, 0, 0) * ihxb
                              + gex(ex, 1, -1, 0) * ihym)
              + m["zxLym"] * (gey(ey, -1, 0, 0) * ihxa
                              - gex(ex, 0, -1, 0) * ihym)
              + m["xzRym"] * (gez(ez, 0, -1, 1) * ihym
                              + gey(ey, 0, 0, 1) * ihzp)
              + m["xzLym"] * (-gez(ez, 0, -1, 0) * ihym
                              + gey(ey, 0, 0, -1) * ihzm))
        r3 = (gey(sy, 0, 1, 0)
              + m["zxRyp"] * (gey(ey, 1, 1, 0) * ihxb
                              - gex(ex, 1, 1, 0) * ihyp)
              + m["zxLyp"] * (gey(ey, -1, 1, 0) * ihxa
                              + gex(ex, 0, 1, 0) * ihyp)
              + m["xzRyp"] * (-gez(ez, 0, 1, 1) * ihyp
                              + gey(ey, 0, 1, 1) * ihzp)
              + m["xzLyp"] * (gez(ez, 0, 1, 0) * ihyp
                              + gey(ey, 0, 1, -1) * ihzm))
        r4 = (gez(sz, 0, 0, 0)
              + m["yxRzm"] * (gez(ez, 1, 0, 0) * ihxb
                              + gex(ex, 1, 0, -1) * ihzm)
              + m["yxLzm"] * (gez(ez, -1, 0, 0) * ihxa
                              - gex(ex, 0, 0, -1) * ihzm)
              + m["xyRzm"] * (gez(ez, 0, 1, 0) * ihyp
                              + gey(ey, 0, 1, -1) * ihzm)
              + m["xyLzm"] * (gez(ez, 0, -1, 0) * ihym
                              - gey(ey, 0, 0, -1) * ihzm))
        r5 = (gez(sz, 0, 0, 1)
              + m["yxRzp"] * (gez(ez, 1, 0, 1) * ihxb
                              - gex(ex, 1, 0, 1) * ihzp)
              + m["yxLzp"] * (gez(ez, -1, 0, 1) * ihxa
                              + gex(ex, 0, 0, 1) * ihzp)
              + m["xyRzp"] * (gez(ez, 0, 1, 1) * ihyp
                              - gey(ey, 0, 1, 1) * ihzp)
              + m["xyLzp"] * (gez(ez, 0, -1, 1) * ihym
                              + gey(ey, 0, 0, 1) * ihzp))
        return r0, r1, r2, r3, r4, r5

    rr = rhs_of(exr, eyr, ezr, sxr, syr, szr)
    ri = rhs_of(exi, eyi, ezi, sxi, syi, szi)
    rhs = list(zip(rr, ri))

    zz = (0.0, 0.0)

    def rp(a):
        return (a, 0.0)

    mat = [
        [a00, zz, rp(a20), rp(a30), rp(a40), rp(a50)],
        [zz, a11, rp(a21), rp(a31), rp(a41), rp(a51)],
        [rp(a20), rp(a21), a22, zz, rp(a42), rp(a52)],
        [rp(a30), rp(a31), zz, a33, rp(a43), rp(a53)],
        [rp(a40), rp(a41), rp(a42), rp(a43), a44, zz],
        [rp(a50), rp(a51), rp(a52), rp(a53), zz, a55],
    ]

    sol = _solve6_pairs(mat, rhs)

    def put(f, sl, v):
        return f.at[sl].set(v)

    slx0 = (_csl(0, nx, px), _nsl(0, ny, py), _nsl(0, nz, pz))
    slx1 = (_csl(1, nx, px), _nsl(0, ny, py), _nsl(0, nz, pz))
    sly0 = (_nsl(0, nx, px), _csl(0, ny, py), _nsl(0, nz, pz))
    sly1 = (_nsl(0, nx, px), _csl(1, ny, py), _nsl(0, nz, pz))
    slz0 = (_nsl(0, nx, px), _nsl(0, ny, py), _csl(0, nz, pz))
    slz1 = (_nsl(0, nx, px), _nsl(0, ny, py), _csl(1, nz, pz))

    exr = put(put(exr, slx0, sol[0][0]), slx1, sol[1][0])
    exi = put(put(exi, slx0, sol[0][1]), slx1, sol[1][1])
    eyr = put(put(eyr, sly0, sol[2][0]), sly1, sol[3][0])
    eyi = put(put(eyi, sly0, sol[2][1]), sly1, sol[3][1])
    ezr = put(put(ezr, slz0, sol[4][0]), slz1, sol[5][0])
    ezi = put(put(ezi, slz0, sol[4][1]), slz1, sol[5][1])
    return exr, exi, eyr, eyi, ezr, ezi


def _split_inputs(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z):
    """(re, im) planes in core order: 12 field/source + 6 eta arrays."""
    fields12 = []
    for f in (ex, ey, ez, sx, sy, sz):
        fields12 += [jnp.real(f), jnp.imag(f)]
    etas6 = []
    for f in (eta_x, eta_y, eta_z):
        etas6 += [jnp.real(f), jnp.imag(f)]
    return fields12, etas6


def gauss_seidel_phase_split(ex, ey, ez, sx, sy, sz, eta_x, eta_y,
                             eta_z, zeta, hx, hy, hz, px, py, pz):
    """Complex-in/complex-out wrapper over the split-real phase core.

    Equivalent to smoothers.gauss_seidel_phase; exists to validate the
    split arithmetic (and as the non-pallas fallback of the split
    path).
    """
    fields12, etas6 = _split_inputs(ex, ey, ez, sx, sy, sz,
                                    eta_x, eta_y, eta_z)
    out = _phase_core(*fields12, *etas6, zeta, hx, hy, hz, px, py, pz)
    return (out[0] + 1j * out[1], out[2] + 1j * out[3],
            out[4] + 1j * out[5])


def gauss_seidel_phase_pallas(ex, ey, ez, sx, sy, sz, eta_x, eta_y,
                              eta_z, zeta, hx, hy, hz, px, py, pz,
                              interpret=False):
    """Whole-phase Pallas kernel (v1: all arrays VMEM-resident).

    Complex inputs are split to (re, im) float planes outside the
    kernel; the body runs :func:`_phase_core` on VMEM refs.  Suitable
    for levels whose working set fits VMEM (~16 MB); fine levels use
    :func:`gauss_seidel_phase_pallas_tiled`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fields12, etas6 = _split_inputs(ex, ey, ez, sx, sy, sz,
                                    eta_x, eta_y, eta_z)

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


# -------------------------------------------------------------------------
# Fine-level tiled kernel: double-buffered HBM->VMEM streaming.
# -------------------------------------------------------------------------

# Array families by shape, relative to the (nx, ny, nz) cell counts:
#   'x' (ex, sx):      (nx,   ny+1, nz+1)   x cell-type, y node-type
#   'y' (ey, sy):      (nx+1, ny,   nz+1)
#   'z' (ez, sz):      (nx+1, ny+1, nz  )
#   'c' (eta*, zeta):  (nx,   ny,   nz  )
# A tile of T blocks needs 2T window planes on cell-type axes and
# 2T+1 on node-type axes (1-plane halo), z kept whole.
_FAM = ["x", "x", "y", "y", "z", "z",      # ex, ey, ez  (re, im)
        "x", "x", "y", "y", "z", "z",      # sx, sy, sz  (re, im)
        "c", "c", "c", "c", "c", "c", "c"]  # eta_x/y/z (re, im), zeta
_N_BIG = len(_FAM)


def use_tiled(*arrays):
    """Should this phase use the tiled kernel?  (working set vs VMEM)

    ``EMG3D_TPU_PALLAS_TILED`` = ``auto`` (default: tile when the
    whole-phase working set exceeds ``EMG3D_TPU_PALLAS_VMEM_CAP_MB``,
    default 8 MB) | ``1`` (always) | ``0`` (never — v1 whole-phase).
    """
    mode = os.environ.get("EMG3D_TPU_PALLAS_TILED", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    cap = float(os.environ.get("EMG3D_TPU_PALLAS_VMEM_CAP_MB", "8"))
    ws = sum(a.size * a.dtype.itemsize for a in arrays)
    return ws > cap * 2**20


def gauss_seidel_phase_pallas_tiled(ex, ey, ez, sx, sy, sz, eta_x,
                                    eta_y, eta_z, zeta, hx, hy, hz,
                                    px, py, pz, tile=None,
                                    interpret=False):
    """Fine-level phase kernel: (x, y)-tiled, double-buffered DMA.

    The phase block (ncx, ncy, ncz) is tiled T x T over (x, y); each
    tile's 19 input windows are DMA'd HBM->VMEM while the previous
    tile computes, and its 6 updated field windows are DMA'd back
    while the next tile computes (2-slot rotation).  Outputs alias
    the (split) field inputs, so planes outside the phase's update
    set keep their values without any extra traffic.

    See the module docstring for the tiling algebra; correctness of
    halo overlaps, full-window writebacks and ragged-edge recompute
    follows from the 8-color decoupling (a phase never reads what it
    writes).

    ``tile`` (or ``EMG3D_TPU_PALLAS_TILE``, default 4) is T, the
    number of stride-2 blocks per tile axis: the per-tile VMEM
    footprint is about ``25 * (2T+1)^2 * nz * itemsize * 2 slots``
    (~1.9 MB for T=4, f32, nz=128).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny, nz = hx.size, hy.size, hz.size
    ncx = len(range(px, nx - 1, 2))
    ncy = len(range(py, ny - 1, 2))
    ncz = len(range(pz, nz - 1, 2))
    if min(ncx, ncy, ncz) == 0:
        return ex, ey, ez

    if tile is None:
        tile = int(os.environ.get("EMG3D_TPU_PALLAS_TILE", "4"))
    T = max(1, min(tile, ncx, ncy))
    ntx = -(-ncx // T)
    nty = -(-ncy // T)
    nt = ntx * nty

    fields12, etas6 = _split_inputs(ex, ey, ez, sx, sy, sz,
                                    eta_x, eta_y, eta_z)
    big = fields12 + etas6 + [zeta]
    rdt = zeta.dtype

    # Packed width-coefficient planes (whole, VMEM-resident): rows are
    # [k·, k·, ih·, ih·] at the phase's cell slices along each axis.
    kx, ky, kz = 0.5 / hx, 0.5 / hy, 0.5 / hz
    ihx, ihy, ihz = 1.0 / hx, 1.0 / hy, 1.0 / hz
    xa, xb = _csl(0, nx, px), _csl(1, nx, px)
    ym, yp = _csl(0, ny, py), _csl(1, ny, py)
    zm, zp = _csl(0, nz, pz), _csl(1, nz, pz)
    cx = jnp.stack([kx[xa], kx[xb], ihx[xa], ihx[xb]]).astype(rdt)
    cy = jnp.stack([ky[ym], ky[yp], ihy[ym], ihy[yp]]).astype(rdt)
    cz = jnp.stack([kz[zm], kz[zp], ihz[zm], ihz[zp]]).astype(rdt)

    # Static window extents per family.
    wx = {"x": 2 * T, "y": 2 * T + 1, "z": 2 * T + 1, "c": 2 * T}
    wy = {"x": 2 * T + 1, "y": 2 * T, "z": 2 * T + 1, "c": 2 * T}
    wz = {"x": nz + 1, "y": nz + 1, "z": nz, "c": nz}

    def kernel(*refs):
        ins = refs[:_N_BIG]
        cxr, cyr, czr = refs[_N_BIG:_N_BIG + 3]
        outs = refs[_N_BIG + 3:_N_BIG + 9]
        in_scr = refs[_N_BIG + 9:2 * _N_BIG + 9]
        out_scr = refs[2 * _N_BIG + 9:2 * _N_BIG + 15]
        in_sem, out_sem = refs[2 * _N_BIG + 15:]

        t = pl.program_id(0) * nty + pl.program_id(1)

        def bc(u):
            """Tile u's block origin (clamped: ragged edges recompute)."""
            u = jnp.maximum(u, 0)
            b0 = jnp.minimum((u // nty) * T, ncx - T)
            c0 = jnp.minimum((u % nty) * T, ncy - T)
            return b0, c0

        def in_dma(slot, u, k):
            b0, c0 = bc(u)
            fam = _FAM[k]
            return pltpu.make_async_copy(
                ins[k].at[pl.ds(px + 2 * b0, wx[fam]),
                          pl.ds(py + 2 * c0, wy[fam]), :],
                in_scr[k].at[slot],
                in_sem.at[slot, k])

        def out_dma(slot, u, k):
            b0, c0 = bc(u)
            fam = _FAM[k]
            return pltpu.make_async_copy(
                out_scr[k].at[slot],
                outs[k].at[pl.ds(px + 2 * b0, wx[fam]),
                           pl.ds(py + 2 * c0, wy[fam]), :],
                out_sem.at[slot, k])

        slot = t % 2

        @pl.when(t == 0)
        def _():
            for k in range(_N_BIG):
                in_dma(0, 0, k).start()

        # Prefetch tile t+1 while tile t computes.
        @pl.when(t + 1 < nt)
        def _():
            for k in range(_N_BIG):
                in_dma((t + 1) % 2, t + 1, k).start()

        for k in range(_N_BIG):
            in_dma(slot, t, k).wait()

        # The out scratch slot is reused every other step: tile t-2's
        # writeback must have drained before tile t overwrites it.
        if nt > 2:
            @pl.when(t >= 2)
            def _():
                for k in range(6):
                    out_dma(slot, t - 2, k).wait()

        win = [in_scr[k][slot] for k in range(_N_BIG)]
        b0, c0 = bc(t)
        co = {
            "kxa": cxr[0, pl.ds(b0, T)].reshape(T, 1, 1),
            "kxb": cxr[1, pl.ds(b0, T)].reshape(T, 1, 1),
            "ihxa": cxr[2, pl.ds(b0, T)].reshape(T, 1, 1),
            "ihxb": cxr[3, pl.ds(b0, T)].reshape(T, 1, 1),
            "kym": cyr[0, pl.ds(c0, T)].reshape(1, T, 1),
            "kyp": cyr[1, pl.ds(c0, T)].reshape(1, T, 1),
            "ihym": cyr[2, pl.ds(c0, T)].reshape(1, T, 1),
            "ihyp": cyr[3, pl.ds(c0, T)].reshape(1, T, 1),
            "kzm": czr[0, :].reshape(1, 1, ncz),
            "kzp": czr[1, :].reshape(1, 1, ncz),
            "ihzm": czr[2, :].reshape(1, 1, ncz),
            "ihzp": czr[3, :].reshape(1, 1, ncz),
        }
        res = _phase_core_coeffs(*win[:18], win[18], co,
                                 (2 * T, 2 * T, nz), (0, 0, pz))
        for k in range(6):
            out_scr[k][slot] = res[k]
            out_dma(slot, t, k).start()

        # Drain all in-flight writebacks at the last tile.
        @pl.when(t == nt - 1)
        def _():
            for k in range(6):
                out_dma(slot, t, k).wait()
        if nt >= 2:
            @pl.when(t == nt - 1)
            def _():
                for k in range(6):
                    out_dma((t - 1) % 2, t - 1, k).wait()

    spec_any = pl.BlockSpec(memory_space=pltpu.ANY)
    spec_vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(big[k].shape, rdt)
                 for k in range(6)]
    scratch = (
        [pltpu.VMEM((2, wx[_FAM[k]], wy[_FAM[k]], wz[_FAM[k]]), rdt)
         for k in range(_N_BIG)]
        + [pltpu.VMEM((2, wx[_FAM[k]], wy[_FAM[k]], wz[_FAM[k]]), rdt)
           for k in range(6)]
        + [pltpu.SemaphoreType.DMA((2, _N_BIG)),
           pltpu.SemaphoreType.DMA((2, 6))])

    out = pl.pallas_call(
        kernel,
        grid=(ntx, nty),
        out_shape=out_shape,
        in_specs=[spec_any] * _N_BIG + [spec_vmem] * 3,
        out_specs=[spec_any] * 6,
        scratch_shapes=scratch,
        input_output_aliases={k: k for k in range(6)},
        interpret=interpret,
    )(*big, cx, cy, cz)

    return (out[0] + 1j * out[1], out[2] + 1j * out[3],
            out[4] + 1j * out[5])
