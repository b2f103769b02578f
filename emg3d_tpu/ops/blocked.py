"""Parity-blocked (2x2x2 de-interleaved) point-smoother storage.

The 8-color point phases gather their operands at stride 2 along all
three axes.  At cache-line (CPU) or lane/tile (TPU) granularity a
stride-2 read touches every line of the array, so one phase moves
~25 whole-plane units of traffic while only needing ~7 (see
docs/pallas-smoother.md).  Storing the smoother operands as the eight
parity sub-blocks ``a[bx::2, by::2, bz::2]`` turns EVERY phase gather
into a contiguous slice of one sub-block, and every phase scatter into
a sub-block-sized write (no full-array copy), cutting per-sweep HBM
traffic ~3x where the smoother is bandwidth-bound.

Index algebra (the whole trick): for axis size n, parity p, the
strided phase slices of :mod:`emg3d_tpu.ops.smoothers` map to

- cell-type  ``csl(o, n, p) = o+p : n-1+o : 2``
  == ``block[(o+p) % 2][(o+p)//2 : (o+p)//2 + nc]``
- node-type  ``nsl(d, n, p) = 1+d+p : n+d : 2``
  == ``block[(1+d+p) % 2][(1+d+p)//2 : (1+d+p)//2 + nc]``

with the phase-block length ``nc = (n - p) // 2`` shared by every
gather of the phase (the original slices are valid, hence so are the
block slices).  The physics is :func:`emg3d_tpu.ops.smoothers._phase_solve`
— shared, not duplicated; this module only re-implements the gathers
and scatters.

A blocked array is a flat tuple of 8 sub-arrays indexed
``4*bx + 2*by + bz`` (a pytree, so blocked operands pass through jit
boundaries like any other argument).

Reference: the traffic analysis corresponds to the reference's
in-place scalar smoother (emg3d/core.py:210-503), which has no such
penalty because its scalar loops read each element exactly once; the
blocked layout is how a vector machine gets that property back.
"""

import jax.numpy as jnp

from emg3d_tpu.ops.smoothers import (
    _m_coefficients, _phase_solve, phase_colors)

__all__ = ["to_blocks", "from_blocks", "gauss_seidel_phase_blocked",
           "gauss_seidel_sweep_blocked", "gauss_seidel_blocked",
           "block_operands"]


def __dir__():
    return __all__


def _bi(bx, by, bz):
    return 4 * bx + 2 * by + bz


def to_blocks(a):
    """Split a 3-D array into its 8 parity sub-blocks (flat tuple)."""
    return tuple(a[bx::2, by::2, bz::2]
                 for bx in (0, 1) for by in (0, 1) for bz in (0, 1))


def from_blocks(blocks, shape):
    """Re-interleave 8 parity sub-blocks into a dense (shape) array."""
    out = jnp.zeros(shape, blocks[0].dtype)
    i = 0
    for bx in (0, 1):
        for by in (0, 1):
            for bz in (0, 1):
                out = out.at[bx::2, by::2, bz::2].set(blocks[i])
                i += 1
    return out


def block_operands(sx, sy, sz, eta_x, eta_y, eta_z, zeta):
    """Block the phase-invariant operands once (per level, per solve)."""
    return tuple(to_blocks(a) for a in
                 (sx, sy, sz, eta_x, eta_y, eta_z, zeta))


def gauss_seidel_phase_blocked(exb, eyb, ezb, sxb, syb, szb, etaxb,
                               etayb, etazb, zetab, hx, hy, hz,
                               px, py, pz):
    """One point phase on parity-blocked operands.

    Same update as ``smoothers.gauss_seidel_phase`` (the strided
    kernel), but every gather is a contiguous sub-block slice and the
    six scatters are sub-block writes.  Returns the updated blocked
    (ex, ey, ez).
    """
    nx, ny, nz = hx.size, hy.size, hz.size
    ncx = (nx - px) // 2
    ncy = (ny - py) // 2
    ncz = (nz - pz) // 2

    def tcell(o, p):
        return o + p

    def tnode(d, p):
        return 1 + d + p

    def bwin(blocks, tx, ty, tz):
        """The phase window at block coordinates (tx, ty, tz)."""
        b = blocks[_bi(tx % 2, ty % 2, tz % 2)]
        return b[tx // 2:tx // 2 + ncx,
                 ty // 2:ty // 2 + ncy,
                 tz // 2:tz // 2 + ncz]

    # 1-D width coefficients at the phase slices (tiny; unblocked).
    kx, ky, kz = 0.5 / hx, 0.5 / hy, 0.5 / hz
    ihx, ihy, ihz = 1.0 / hx, 1.0 / hy, 1.0 / hz

    def csl1(o, n, p):
        return slice(o + p, n - 1 + o, 2)

    xa, xb = csl1(0, nx, px), csl1(1, nx, px)
    ym, yp = csl1(0, ny, py), csl1(1, ny, py)
    zm, zp = csl1(0, nz, pz), csl1(1, nz, pz)
    ih = {
        "ihxa": ihx[xa][:, None, None], "ihxb": ihx[xb][:, None, None],
        "ihym": ihy[ym][None, :, None], "ihyp": ihy[yp][None, :, None],
        "ihzm": ihz[zm][None, None, :], "ihzp": ihz[zp][None, None, :],
    }

    # zeta gathers (all-cell) and the 24 m coefficients.
    z = {}
    for xk, ox in (("a", 0), ("b", 1)):
        for yk, oy in (("m", 0), ("p", 1)):
            for zk, oz in (("m", 0), ("p", 1)):
                z[xk + yk + zk] = bwin(zetab, tcell(ox, px),
                                       tcell(oy, py), tcell(oz, pz))
    m = _m_coefficients(
        z, kx[xa][:, None, None], kx[xb][:, None, None],
        ky[ym][None, :, None], ky[yp][None, :, None],
        kz[zm][None, None, :], kz[zp][None, None, :])

    # Diagonal eta sums (4-cell averages around each edge).
    def st(etab, ax, o):
        out = 0.0
        pp = (px, py, pz)
        for d1 in (0, 1):
            for d2 in (0, 1):
                offs = [None, None, None]
                offs[ax] = o
                others = [i for i in range(3) if i != ax]
                offs[others[0]] = d1
                offs[others[1]] = d2
                out = out + bwin(etab, tcell(offs[0], pp[0]),
                                 tcell(offs[1], pp[1]),
                                 tcell(offs[2], pp[2]))
        return out / 4.0

    sts = (st(etaxb, 0, 0), st(etaxb, 0, 1), st(etayb, 1, 0),
           st(etayb, 1, 1), st(etazb, 2, 0), st(etazb, 2, 1))

    fld = {"ex": exb, "ey": eyb, "ez": ezb,
           "sx": sxb, "sy": syb, "sz": szb}
    kinds = {"ex": "cnn", "sx": "cnn", "ey": "ncn", "sy": "ncn",
             "ez": "nnc", "sz": "nnc"}

    def gf(name, i, j, k):
        kd = kinds[name]
        ts = []
        for v, knd, p in zip((i, j, k), kd, (px, py, pz)):
            ts.append(tcell(v, p) if knd == "c" else tnode(v, p))
        return bwin(fld[name], *ts)

    sol = _phase_solve(gf, sts, m, ih)

    def put(blocks, tx, ty, tz, val):
        idx = _bi(tx % 2, ty % 2, tz % 2)
        b = blocks[idx].at[tx // 2:tx // 2 + ncx,
                           ty // 2:ty // 2 + ncy,
                           tz // 2:tz // 2 + ncz].set(val)
        return blocks[:idx] + (b,) + blocks[idx + 1:]

    t0x, t1x = tcell(0, px), tcell(1, px)
    t0y, t1y = tcell(0, py), tcell(1, py)
    t0z, t1z = tcell(0, pz), tcell(1, pz)
    nxx, nyy, nzz = tnode(0, px), tnode(0, py), tnode(0, pz)

    exb = put(exb, t0x, nyy, nzz, sol[0])
    exb = put(exb, t1x, nyy, nzz, sol[1])
    eyb = put(eyb, nxx, t0y, nzz, sol[2])
    eyb = put(eyb, nxx, t1y, nzz, sol[3])
    ezb = put(ezb, nxx, nyy, t0z, sol[4])
    ezb = put(ezb, nxx, nyy, t1z, sol[5])
    return exb, eyb, ezb


def gauss_seidel_blocked(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z,
                         zeta, hx, hy, hz, nu):
    """Drop-in for ``smoothers.gauss_seidel`` on dense arrays.

    The solver-facing entry point (``EMG3D_TPU_SMOOTHER=blocked``):
    operands and fields are de-interleaved ONCE, all ``nu`` sweeps
    (8 phases each, alternating order) run on the blocked layout, and
    only the fields are re-interleaved at the end — the conversion
    cost (~12 plane-units) is amortized over ``8 * nu`` phases whose
    gathers/scatters are all contiguous sub-block slices.
    """
    shape = (hx.size, hy.size, hz.size)
    fblocks = tuple(to_blocks(a) for a in (ex, ey, ez))
    ops = block_operands(sx, sy, sz, eta_x, eta_y, eta_z, zeta)
    for sweep in range(nu):
        for c in phase_colors(shape, sweep % 2 == 1):
            fblocks = gauss_seidel_phase_blocked(
                *fblocks, *ops, hx, hy, hz, *c)
    return (from_blocks(fblocks[0], ex.shape),
            from_blocks(fblocks[1], ey.shape),
            from_blocks(fblocks[2], ez.shape))


def gauss_seidel_sweep_blocked(ex, ey, ez, sx, sy, sz, eta_x, eta_y,
                               eta_z, zeta, hx, hy, hz, reverse):
    """Drop-in for ``smoothers.gauss_seidel_sweep`` on dense arrays.

    Blocks all operands, runs the eight phases on the blocked layout,
    and re-interleaves the fields.  The conversions cost ~12 extra
    plane-units per call — already amortized over the 8 phases; the
    solver-integrated path (operands pre-blocked per level, fields
    blocked across a whole smoothing call) drops most of that too.
    """
    fblocks = tuple(to_blocks(a) for a in (ex, ey, ez))
    ops = block_operands(sx, sy, sz, eta_x, eta_y, eta_z, zeta)
    for c in phase_colors((hx.size, hy.size, hz.size), reverse):
        fblocks = gauss_seidel_phase_blocked(
            *fblocks, *ops, hx, hy, hz, *c)
    return (from_blocks(fblocks[0], ex.shape),
            from_blocks(fblocks[1], ey.shape),
            from_blocks(fblocks[2], ez.shape))
