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

import os

import jax.numpy as jnp

from emg3d_tpu.ops.smoothers import (
    _block_pcr, _block_thomas_paired, _line_last_group_fix,
    _line_x_system, _m_coefficients, _phase_solve, line_phase_colors,
    phase_colors)

__all__ = ["to_blocks", "from_blocks", "gauss_seidel_phase_blocked",
           "gauss_seidel_sweep_blocked", "gauss_seidel_blocked",
           "block_operands", "block_model_operands", "transpose_blocks",
           "line_relax_phase_blocked", "smooth_blocked_dev"]


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


def block_model_operands(eta_x, eta_y, eta_z, zeta):
    """Block the hierarchy-invariant model operands (once per level)."""
    return tuple(to_blocks(a) for a in (eta_x, eta_y, eta_z, zeta))


def transpose_blocks(blocks, tp):
    """Coordinate-permute a blocked array.

    Dense equivalent: ``to_blocks(from_blocks(blocks).transpose(tp))``
    — block indices and sub-block axes permute together.
    """
    inv = tuple(tp.index(a) for a in range(3))
    out = [None] * 8
    for bx in (0, 1):
        for by in (0, 1):
            for bz in (0, 1):
                b = (bx, by, bz)
                src = (b[inv[0]], b[inv[1]], b[inv[2]])
                out[_bi(*b)] = blocks[_bi(*src)].transpose(tp)
    return tuple(out)


# -------------------------------------------------------------------------
# 4-color line relaxation on parity-blocked storage.
#
# The x-line phase gathers operands full-range along x and stride-2
# along the transverse axes.  On blocked storage the transverse windows
# are contiguous sub-block slices (the same algebra as the point
# phase), and the full x range splits naturally into the even/odd
# x-parity lanes: instead of interleaving them back into dense (X,...)
# tensors, the line systems are assembled per lane and solved with a
# paired block-Thomas scan (smoothers._block_thomas_paired) that walks
# E[0], O[0], E[1], O[1], ... — no interleave is ever materialized.
# Physics shared with the strided kernel via smoothers._line_x_system.
# -------------------------------------------------------------------------

def _xlane(blocks, pat, lane, nx, wy, wz):
    """One x-parity lane of a line-phase gather.

    ``pat``: 'a' (x index = group index g, 0..nx-1) or 'b'
    (x index = min(g+1, nx-1)); ``lane``: 0 = even groups, 1 = odd.
    ``wy``/``wz``: (block-parity, offset, length) transverse windows.
    """
    def blk(xq):
        b = blocks[_bi(xq, wy[0], wz[0])]
        return b[:, wy[1]:wy[1] + wy[2], wz[1]:wz[1] + wz[2]]

    nE, nO = (nx + 1) // 2, nx // 2
    if pat == "a":
        return blk(lane)[:nE if lane == 0 else nO]
    # pat == 'b': the clamp min(g+1, nx-1) crosses parity at the end.
    if lane == 0:
        if nx % 2 == 0:
            return blk(1)[:nE]
        return jnp.concatenate([blk(1)[:nO], blk(0)[nE - 1:nE]], axis=0)
    if nx % 2 == 0:
        return jnp.concatenate([blk(0)[1:nO], blk(1)[nO - 1:nO]], axis=0)
    return blk(0)[1:nO + 1]


def _interleave_x(aE, aO):
    """Interleave even/odd x-lane stacks into a dense (nE+nO, ...) stack."""
    nE, nO = aE.shape[0], aO.shape[0]
    if nE == nO:
        return jnp.stack([aE, aO], axis=1).reshape(
            (2 * nE,) + aE.shape[1:])
    core = jnp.stack([aE[:nO], aO], axis=1).reshape(
        (2 * nO,) + aE.shape[1:])
    return jnp.concatenate([core, aE[nO:]], axis=0)


def _line_relax_x_phase_blocked(exb, eyb, ezb, sxb, syb, szb, etaxb,
                                etayb, etazb, zetab, hx, hy, hz, py, pz):
    """One x-line phase on parity-blocked operands.

    Same update as ``smoothers._line_relax_x_phase`` — the gathers are
    contiguous sub-block slices, the line solve runs on the x-parity
    lane pair directly.  Returns the updated blocked (ex, ey, ez).
    """
    nx, ny, nz = hx.size, hy.size, hz.size
    cdtype = exb[0].dtype
    ncy, ncz = (ny - py) // 2, (nz - pz) // 2
    nE, nO = (nx + 1) // 2, nx // 2

    blkmap = {"ex": exb, "ey": eyb, "ez": ezb, "sx": sxb, "sy": syb,
              "sz": szb, "eta_x": etaxb, "eta_y": etayb,
              "eta_z": etazb, "zeta": zetab}

    def make_gf(lane):
        def gf(name, pat, ty, tz):
            return _xlane(blkmap[name], pat, lane, nx,
                          (ty % 2, ty // 2, ncy), (tz % 2, tz // 2, ncz))
        return gf

    # Width coefficients: the tiny 1-D x arrays are lane-split by
    # strided slicing (negligible traffic); transverse rows are shared.
    idx_b = jnp.minimum(jnp.arange(nx) + 1, nx - 1)
    hx_b = hx[idx_b]

    def trow(v, t, nc):
        return v[t:t + 2 * nc:2]

    tc = {
        "kym": trow(0.5 / hy, py, ncy)[None, :, None],
        "kyp": trow(0.5 / hy, 1 + py, ncy)[None, :, None],
        "kzm": trow(0.5 / hz, pz, ncz)[None, None, :],
        "kzp": trow(0.5 / hz, 1 + pz, ncz)[None, None, :],
        "ihym": trow(1.0 / hy, py, ncy)[None, :, None],
        "ihyp": trow(1.0 / hy, 1 + py, ncy)[None, :, None],
        "ihzm": trow(1.0 / hz, pz, ncz)[None, None, :],
        "ihzp": trow(1.0 / hz, 1 + pz, ncz)[None, None, :],
    }

    def xc_for(lane):
        sl = slice(lane, None, 2)
        return {
            "kxa": (0.5 / hx[sl])[:, None, None],
            "kxb": (0.5 / hx_b[sl])[:, None, None],
            "ihxa": (1.0 / hx[sl])[:, None, None],
            "ihxb": (1.0 / hx_b[sl])[:, None, None],
            **tc,
        }

    midE, leftE, rhsE = _line_x_system(make_gf(0), xc_for(0), py, pz,
                                       cdtype)
    midO, leftO, rhsO = _line_x_system(make_gf(1), xc_for(1), py, pz,
                                       cdtype)
    # The global last group (g = nx-1) lives on the E stack when nx is
    # odd, on the O stack when nx is even.
    if nx % 2 == 1:
        midE, leftE, rhsE = _line_last_group_fix(midE, leftE, rhsE)
    else:
        midO, leftO, rhsO = _line_last_group_fix(midO, leftO, rhsO)

    if os.environ.get("EMG3D_TPU_LINE_SOLVER", "thomas") == "pcr":
        u = _block_pcr(_interleave_x(midE, midO),
                       _interleave_x(leftE, leftO),
                       _interleave_x(rhsE, rhsO))
        uE, uO = u[0::2], u[1::2]
    else:
        uE, uO = _block_thomas_paired(midE, leftE, rhsE,
                                      midO, leftO, rhsO)

    # Scatter.  x targets: ex covers all groups; the transverse edges
    # live at x = g+1 for g = 0..nx-2, i.e. odd x targets take uE rows
    # and even x targets (offset 1 in the even block) take uO rows.
    def putx(blocks, xq, x0, cnt, wy, wz, val):
        idx = _bi(xq, wy[0], wz[0])
        b = blocks[idx].at[x0:x0 + cnt,
                           wy[1]:wy[1] + ncy,
                           wz[1]:wz[1] + ncz].set(val)
        return blocks[:idx] + (b,) + blocks[idx + 1:]

    def w(t):
        return (t % 2, t // 2)

    wyc, wzc = w(1 + py), w(1 + pz)            # ycN / zcN node windows
    wym, wyp = w(py), w(1 + py)                # ymC / ypC cell windows
    wzm, wzp = w(pz), w(1 + pz)                # zmC / zpC cell windows

    exb = putx(exb, 0, 0, nE, wyc, wzc, uE[..., 0])
    exb = putx(exb, 1, 0, nO, wyc, wzc, uO[..., 0])

    cE = nE - (nx % 2)            # odd x targets (1, 3, ...)
    cO = nO - (1 - nx % 2)        # even x targets (2, 4, ...)
    eyb = putx(eyb, 1, 0, cE, wym, wzc, uE[:cE, ..., 1])
    eyb = putx(eyb, 0, 1, cO, wym, wzc, uO[:cO, ..., 1])
    eyb = putx(eyb, 1, 0, cE, wyp, wzc, uE[:cE, ..., 2])
    eyb = putx(eyb, 0, 1, cO, wyp, wzc, uO[:cO, ..., 2])
    ezb = putx(ezb, 1, 0, cE, wyc, wzm, uE[:cE, ..., 3])
    ezb = putx(ezb, 0, 1, cO, wyc, wzm, uO[:cO, ..., 3])
    ezb = putx(ezb, 1, 0, cE, wyc, wzp, uE[:cE, ..., 4])
    ezb = putx(ezb, 0, 1, cO, wyc, wzp, uO[:cO, ..., 4])
    return exb, eyb, ezb


def _frame_maps(axis):
    """Field/operand role+transpose maps for the permuted line frames.

    The y-/z-line phases are the x-phase in a coordinate-permuted
    frame (the curl-curl operator is permutation-covariant), exactly
    as in ``smoothers.gauss_seidel_line_sweep``.
    """
    if axis == 0:
        return None, lambda t3: t3, lambda t3: t3

    tp = (1, 0, 2) if axis == 1 else (2, 1, 0)

    def to_frame(t3):
        T = [transpose_blocks(b, tp) for b in t3]
        if axis == 1:
            return (T[1], T[0], T[2])
        return (T[2], T[1], T[0])

    def from_frame(t3):
        if axis == 1:
            t3 = (t3[1], t3[0], t3[2])
        else:
            t3 = (t3[2], t3[1], t3[0])
        return tuple(transpose_blocks(b, tp) for b in t3)

    return tp, to_frame, from_frame


def line_relax_phase_blocked(exb, eyb, ezb, sxb, syb, szb, etaxb, etayb,
                             etazb, zetab, hx, hy, hz, p1, p2, axis):
    """One line-relaxation phase along ``axis`` on blocked storage.

    Drop-in blocked analogue of ``smoothers.gauss_seidel_line_phase``
    ((p1, p2) are the permuted-frame transverse parities).
    """
    tp, to_frame, from_frame = _frame_maps(axis)
    if tp is None:
        return _line_relax_x_phase_blocked(
            exb, eyb, ezb, sxb, syb, szb, etaxb, etayb, etazb, zetab,
            hx, hy, hz, p1, p2)
    hF = (hy, hx, hz) if axis == 1 else (hz, hy, hx)
    fF = to_frame((exb, eyb, ezb))
    sF = to_frame((sxb, syb, szb))
    eF = to_frame((etaxb, etayb, etazb))
    zF = transpose_blocks(zetab, tp)
    out = _line_relax_x_phase_blocked(*fF, *sF, *eF, zF, *hF, p1, p2)
    return from_frame(out)


def transposed_model_frames(ops):
    """Pre-transpose the blocked model operands into the y-/z-frames.

    The model is invariant across smoothing calls, so the per-call
    frame transposes of eta/zeta in :func:`smooth_blocked_dev` are
    wasted traffic — the solver stores these once per hierarchy level
    ('blk_t') whenever line relaxation is on.  Returns
    ``{axis: (etaF_x8, etaF_y8, etaF_z8, zetaF8)}`` for axis 1 and 2,
    already in the permuted-frame component order.
    """
    etaxb, etayb, etazb, zetab = ops
    out = {}
    for axis in (1, 2):
        tp, to_frame, _ = _frame_maps(axis)
        eF = to_frame((etaxb, etayb, etazb))
        zF = transpose_blocks(zetab, tp)
        out[axis] = (*eF, zF)
    return out


def smooth_blocked_dev(e, s, ops, hx, hy, hz, c_lr_dir, nu, ops_t=None):
    """Blocked-storage equivalent of ``solver._smooth_dev``.

    De-interleaves the fields and the source ONCE, runs every point
    and line sweep of the smoothing call on the blocked layout (the
    per-axis frame transposes happen once per axis, amortized over the
    4 * nu line phases of that axis), and re-interleaves the fields at
    the end.  ``ops`` are the pre-blocked model operands
    (:func:`block_model_operands` — stored per hierarchy level by the
    solver, so they are never re-blocked per call); ``ops_t`` the
    optional pre-transposed y-/z-frames of the same operands
    (:func:`transposed_model_frames` — drops the per-call model
    transposes of the line-relaxation frames too).
    """
    shape = (hx.size, hy.size, hz.size)
    shapes = tuple(a.shape for a in e)
    fb = tuple(to_blocks(a) for a in e)
    sb = tuple(to_blocks(a) for a in s)
    etaxb, etayb, etazb, zetab = ops

    if c_lr_dir == 0:
        for sweep in range(nu):
            for c in phase_colors(shape, sweep % 2 == 1):
                fb = gauss_seidel_phase_blocked(
                    *fb, *sb, etaxb, etayb, etazb, zetab,
                    hx, hy, hz, *c)

    for axis, dirs in ((0, (1, 5, 6, 7)), (1, (2, 4, 6, 7)),
                       (2, (3, 4, 5, 7))):
        if c_lr_dir not in dirs:
            continue
        tp, to_frame, from_frame = _frame_maps(axis)
        if tp is None:
            fF, sF = fb, sb
            eF = (etaxb, etayb, etazb)
            zF = zetab
            hF = (hx, hy, hz)
        else:
            fF = to_frame(fb)
            sF = to_frame(sb)
            if ops_t is not None:
                exF, eyF, ezF, zF = ops_t[axis]
                eF = (exF, eyF, ezF)
            else:
                eF = to_frame((etaxb, etayb, etazb))
                zF = transpose_blocks(zetab, tp)
            hF = (hy, hx, hz) if axis == 1 else (hz, hy, hx)
        colors = line_phase_colors(shape, axis, False)
        for sweep in range(nu):
            order = colors if sweep % 2 == 0 else colors[::-1]
            for c in order:
                fF = _line_relax_x_phase_blocked(*fF, *sF, *eF, zF,
                                                 *hF, *c)
        fb = fF if tp is None else from_frame(fF)

    return tuple(from_blocks(b, sh) for b, sh in zip(fb, shapes))


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
