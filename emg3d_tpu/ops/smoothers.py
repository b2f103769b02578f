"""TPU-native Gauss-Seidel smoothers: multicolor node relaxation and
multicolor line relaxation.

The reference smoothers (emg3d/core.py:210-1348) are strictly sequential:
lexicographic Gauss-Seidel over nodes (6 coupled edges per node, solved as
one complex-symmetric 6x6 system, Arnold-Falk-Winther smoother) and over
lines (banded complex-symmetric system of 5n-4 unknowns per line, solved
with a non-standard LDL^T, core.py:1481-1616).

A TPU has no efficient sequential scalar path, so the idiomatic rebuild
uses *multicolor* orderings, which preserve the exact per-node/per-line
subsystem solves while exposing full data parallelism:

- Node smoother: 8-color (2x2x2 parity) ordering over the interior
  nodes.  A node's 6x6 system reads edges written only by nodes in its
  3x3x3 neighbourhood; nodes of equal parity in all three coordinates
  differ by even offsets, so each color class is a true independent set
  (distance-2 coloring) — every phase is an exact Gauss-Seidel update
  with the latest neighbour values, unlike a 2-coloring which degrades
  to within-color Jacobi and ruins the multigrid convergence factor.
  Each phase operates on the stride-2 subgrid of its color, so the
  total work per sweep equals one full-grid sweep.

- Line relaxation: lines along one axis are 4-colored by the parity
  pair of the transverse node coordinates (same argument: line systems
  couple only to transversely-adjacent lines).  The per-line banded
  system is solved as a *block-tridiagonal* system with 5x5 blocks via
  batched block-Thomas elimination under ``lax.scan`` — all lines of
  one color solve simultaneously per step.  (The banded layout of the
  reference, core.py:1351-1477, is equivalent: ``middle`` is the
  diagonal block, ``left`` the sub-diagonal block.)

Convergence-rate parity with the reference's lexicographic ordering is
established by the solver-level tests (cycles to 1e-6), not bitwise
equality — the standard trade for parallel smoothers.

The y- and z-variants are obtained from the x-variant by coordinate
permutation (the curl-curl operator is permutation-covariant), replacing
the reference's three hand-written kernels (core.py:506-1348).
"""

import itertools
import os

import jax
import jax.numpy as jnp

# Point-smoother phase implementation, selected by EMG3D_TPU_SMOOTHER
# (read at trace time inside gauss_seidel_phase / gauss_seidel):
#   'auto' (default)   — 'blocked' on the CPU backend, 'xla' elsewhere
#   'xla'              — strided jax.numpy phase kernels
#   'blocked'          — parity-blocked (2x2x2 de-interleaved) storage
#                        across each nu-sweep smoothing call: every
#                        phase gather/scatter a contiguous sub-block
#                        slice (~3x less sweep traffic; ops/blocked.py)
#   'pallas'           — Mosaic-compiled whole-phase kernel (TPU; v1:
#                        all arrays VMEM-resident — coarse/mid levels)
#   'pallas-interpret' — the same kernel in interpret mode (any
#                        backend; validation only, slow)

__all__ = ["gauss_seidel", "gauss_seidel_sweep", "gauss_seidel_phase",
           "gauss_seidel_line", "gauss_seidel_line_sweep",
           "gauss_seidel_line_phase", "phase_colors", "line_phase_colors",
           "solve_banded_5x5", "resolve_impl"]


def _scan_unroll(steps):
    """Per-step unroll factor for the block-Thomas scans (trace time).

    ``lax.scan`` pays a per-iteration control overhead that XLA:CPU
    does not amortize, so SHORT scans (small grids and every coarse
    hierarchy level) are loop-overhead-dominated there.  Measured on
    the blocked x-line smooth (nu=2, this host, 2026-08-19): unroll=2
    is 2.04x at 32 steps (64-cube) but 0.75x at 64 steps (128-cube,
    register/cache pressure beats the saved overhead) — hence
    length-adaptive.  ``EMG3D_TPU_SCAN_UNROLL`` (int) overrides for
    every scan.  Off-CPU the default stays 1 until a device
    measurement says otherwise (tools/tpu_profile.py).
    """
    v = os.environ.get("EMG3D_TPU_SCAN_UNROLL", "auto")
    if v != "auto":
        return max(1, int(v))
    if jax.default_backend() != "cpu":
        return 1
    return 2 if steps <= 40 else 1


# -------------------------------------------------------------------------
# Small dense solves, unrolled (no pivoting — mirrors reference
# core.py:1481-1616 which factors without pivoting).
# -------------------------------------------------------------------------

def _solve_lower_unrolled(mat_rows, rhs_rows):
    """Gaussian elimination without pivoting, fully unrolled.

    ``mat_rows``: list of n arrays (..., n) — the matrix rows;
    ``rhs_rows``: list of n arrays (..., m) — the rhs rows.
    Returns list of n arrays (..., m) — the solution rows.
    """
    n = len(mat_rows)
    rows = list(mat_rows)
    rhs = list(rhs_rows)

    for k in range(n):
        inv_piv = 1.0 / rows[k][..., k]
        for i in range(k + 1, n):
            f = rows[i][..., k] * inv_piv
            rows[i] = rows[i] - f[..., None] * rows[k]
            rhs[i] = rhs[i] - f[..., None] * rhs[k]

    x = [None] * n
    for i in range(n - 1, -1, -1):
        acc = rhs[i]
        for j in range(i + 1, n):
            acc = acc - rows[i][..., j, None] * x[j]
        x[i] = acc / rows[i][..., i, None]
    return x


def _solve5(mat, rhs):
    """Solve batched 5x5 systems: mat (..., 5, 5), rhs (..., 5, m)."""
    rows = [mat[..., i, :] for i in range(5)]
    rr = [rhs[..., i, :] for i in range(5)]
    x = _solve_lower_unrolled(rows, rr)
    return jnp.stack(x, axis=-2)


def solve_banded_5x5(mat, rhs):
    """Public alias used by tests: batched 5x5 dense solve."""
    return _solve5(mat, rhs)


def _solve6(rows, rhs):
    """Solve batched 6x6 systems given as 6 row-arrays and 6 rhs entries.

    rows[i]: (..., 6); rhs[i]: (...,).  Returns list of 6 (...) arrays.
    """
    rr = [r[..., None] for r in rhs]
    x = _solve_lower_unrolled(rows, rr)
    return [xi[..., 0] for xi in x]


# -------------------------------------------------------------------------
# Shared coefficient assembly.
#
# Naming follows the reference (core.py:350-374): m{ab}{L|R}{x|y|z}{m|p} is
# the averaged 1/mu_r (zeta) coefficient of the curl-curl stencil; e.g.
# mzyRxm couples through the y-derivative at the right (R) y-side of the
# x-edge left (m) of the node.
# -------------------------------------------------------------------------

def _zeta_gathers(zeta_a, zeta_b):
    """All eight (x in {a,b}) x (y in {m,p}) x (z in {m,p}) zeta gathers.

    ``zeta_a``/``zeta_b`` are the two x-gathers of zeta (shape (X, ny, nz));
    returns dict with keys like 'amp' = (x=a, y=m, z=p), each of shape
    (X, ny-1, nz-1).
    """
    out = {}
    for xk, zz in (("a", zeta_a), ("b", zeta_b)):
        out[xk + "mm"] = zz[:, :-1, :-1]
        out[xk + "mp"] = zz[:, :-1, 1:]
        out[xk + "pm"] = zz[:, 1:, :-1]
        out[xk + "pp"] = zz[:, 1:, 1:]
    return out


def _m_coefficients(z, kxa, kxb, kym, kyp, kzm, kzp):
    """The 24 averaged-zeta coefficients (reference core.py:350-374).

    ``z`` is the gather dict from :func:`_zeta_gathers`; the k* are the
    half-inverse widths 0.5/h broadcast to the block shape.
    """
    m = {}
    m["zyLxm"] = kym * (z["amp"] + z["amm"])
    m["zyRxm"] = kyp * (z["app"] + z["apm"])
    m["yzLxm"] = kzm * (z["apm"] + z["amm"])
    m["yzRxm"] = kzp * (z["app"] + z["amp"])
    m["zyLxp"] = kym * (z["bmp"] + z["bmm"])
    m["zyRxp"] = kyp * (z["bpp"] + z["bpm"])
    m["yzLxp"] = kzm * (z["bpm"] + z["bmm"])
    m["yzRxp"] = kzp * (z["bpp"] + z["bmp"])
    m["zxLym"] = kxa * (z["amp"] + z["amm"])
    m["zxRym"] = kxb * (z["bmp"] + z["bmm"])
    m["xzLym"] = kzm * (z["bmm"] + z["amm"])
    m["xzRym"] = kzp * (z["bmp"] + z["amp"])
    m["zxLyp"] = kxa * (z["app"] + z["apm"])
    m["zxRyp"] = kxb * (z["bpp"] + z["bpm"])
    m["xzLyp"] = kzm * (z["bpm"] + z["apm"])
    m["xzRyp"] = kzp * (z["bpp"] + z["app"])
    m["yxLzm"] = kxa * (z["apm"] + z["amm"])
    m["yxRzm"] = kxb * (z["bpm"] + z["bmm"])
    m["xyLzm"] = kym * (z["bmm"] + z["amm"])
    m["xyRzm"] = kyp * (z["bpm"] + z["apm"])
    m["yxLzp"] = kxa * (z["app"] + z["amp"])
    m["yxRzp"] = kxb * (z["bpp"] + z["bmp"])
    m["xyLzp"] = kym * (z["bmp"] + z["amp"])
    m["xyRzp"] = kyp * (z["bpp"] + z["app"])
    return m


def _eta_pairsums(eta_x, eta_y, eta_z):
    """4-cell sums of eta around the edges (full cell extents kept).

    EX: (nx, ny-1, nz-1); EY: (nx-1, ny, nz-1); EZ: (nx-1, ny-1, nz).
    """
    ex4 = (eta_x[:, :-1, :-1] + eta_x[:, 1:, :-1]
           + eta_x[:, :-1, 1:] + eta_x[:, 1:, 1:])
    ey4 = (eta_y[:-1, :, :-1] + eta_y[1:, :, :-1]
           + eta_y[:-1, :, 1:] + eta_y[1:, :, 1:])
    ez4 = (eta_z[:-1, :-1, :] + eta_z[1:, :-1, :]
           + eta_z[:-1, 1:, :] + eta_z[1:, 1:, :])
    return ex4, ey4, ez4


# -------------------------------------------------------------------------
# 8-color point smoother (reference gauss_seidel, core.py:210-503).
# -------------------------------------------------------------------------

def gauss_seidel(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
                 hx, hy, hz, nu):
    """8-color node smoother: ``nu`` sweeps with alternating phase order.

    Thin loop over :func:`gauss_seidel_sweep`; kept for tests/back-compat.
    The solver jits per sweep (two executables per shape, reused for every
    nu) instead of per (shape, nu) — XLA compile time is superlinear in
    graph size, so smaller reused graphs compile far faster.

    ``EMG3D_TPU_SMOOTHER=blocked`` (read at trace time) reroutes the
    whole nu-sweep call through the parity-blocked (2x2x2
    de-interleaved) layout of :mod:`emg3d_tpu.ops.blocked`: one
    de-interleave, ``8 * nu`` contiguous-slice phases, one
    re-interleave — the ~3x sweep-traffic cut of
    docs/pallas-smoother.md.  Unset ('auto'), the blocked layout is
    the DEFAULT on the CPU backend (measured 1.4x faster warm sweeps
    at 64^3 and 1.5x faster end-to-end solves at 48^3 than the
    strided phases); other backends keep the strided kernels until
    the hardware measurement pass (tools/tpu_profile.py) decides —
    stride-2 gathers on the TPU lane dimension are an open lowering
    question.
    """
    impl = resolve_impl()
    if impl == "blocked":
        from emg3d_tpu.ops import blocked
        return blocked.gauss_seidel_blocked(
            ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
            hx, hy, hz, nu)
    fields = (ex, ey, ez)
    for sweep in range(nu):
        fields = gauss_seidel_sweep(
            *fields, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
            hx, hy, hz, sweep % 2 == 1)
    return fields


def gauss_seidel_sweep(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
                       hx, hy, hz, reverse):
    """One 8-color sweep: per node, solve its 6-edge 6x6 subsystem.

    All interior nodes of one (x, y, z)-parity class are relaxed
    simultaneously (their systems are fully decoupled); eight phases per
    sweep; ``reverse`` flips the phase order (the analogue of the
    reference's alternating forward/backward ordering, core.py:308-311).
    Returns the updated (ex, ey, ez).

    Thin loop over :func:`gauss_seidel_phase` — the solver jits each
    phase separately (8 small executables per shape, shared between the
    forward and the reverse order) instead of one 8-phase graph: XLA
    compile time is superlinear in graph size.
    """
    nx, ny, nz = hx.size, hy.size, hz.size
    fields = (ex, ey, ez)
    for c in phase_colors((nx, ny, nz), reverse):
        fields = gauss_seidel_phase(
            *fields, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
            hx, hy, hz, *c)
    return fields


def phase_colors(shape_cells, reverse):
    """The 8-color phase order for one point-smoother sweep.

    Parities with no interior nodes (tiny grids) are skipped; ``reverse``
    flips the order (the analogue of the reference's backward sweep).
    """
    nx, ny, nz = shape_cells
    colors = [(px, py, pz) for pz, py, px in
              itertools.product((0, 1), repeat=3)
              if px < nx - 1 and py < ny - 1 and pz < nz - 1]
    return colors[::-1] if reverse else colors


def line_phase_colors(shape_cells, axis, reverse):
    """The 4-color phase order for one line-relaxation sweep.

    The (p1, p2) parities refer to the transverse axes of the PERMUTED
    frame in which the x-line kernel runs (axis 0: (y, z); axis 1:
    (x, z); axis 2: (y, x)) — the same frames
    :func:`gauss_seidel_line_sweep` uses.
    """
    nx, ny, nz = shape_cells
    n1, n2 = {0: (ny, nz), 1: (nx, nz), 2: (ny, nx)}[axis]
    colors = [(p1, p2) for p2, p1 in itertools.product((0, 1), repeat=2)
              if p1 < n1 - 1 and p2 < n2 - 1]
    return colors[::-1] if reverse else colors


def gauss_seidel_line_phase(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z,
                            zeta, hx, hy, hz, p1, p2, axis):
    """One line-relaxation phase along ``axis`` at transverse parity
    (p1, p2) (parities in the permuted frame, see
    :func:`line_phase_colors`)."""
    if axis == 0:
        return _line_relax_x_phase(ex, ey, ez, sx, sy, sz, eta_x, eta_y,
                                   eta_z, zeta, hx, hy, hz, p1, p2)
    if axis == 1:
        tp = (1, 0, 2)
        out = _line_relax_x_phase(
            ey.transpose(tp), ex.transpose(tp), ez.transpose(tp),
            sy.transpose(tp), sx.transpose(tp), sz.transpose(tp),
            eta_y.transpose(tp), eta_x.transpose(tp), eta_z.transpose(tp),
            zeta.transpose(tp), hy, hx, hz, p1, p2)
        ey2, ex2, ez2 = out
        return ex2.transpose(tp), ey2.transpose(tp), ez2.transpose(tp)
    if axis == 2:
        tp = (2, 1, 0)
        out = _line_relax_x_phase(
            ez.transpose(tp), ey.transpose(tp), ex.transpose(tp),
            sz.transpose(tp), sy.transpose(tp), sx.transpose(tp),
            eta_z.transpose(tp), eta_y.transpose(tp), eta_x.transpose(tp),
            zeta.transpose(tp), hz, hy, hx, p1, p2)
        ez2, ey2, ex2 = out
        return ex2.transpose(tp), ey2.transpose(tp), ez2.transpose(tp)
    raise ValueError(f"axis must be 0, 1, or 2; got {axis}.")


def gauss_seidel_phase(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
                       hx, hy, hz, px, py, pz):
    """Relax the interior nodes of one (x, y, z)-parity class.

    Dispatches on ``EMG3D_TPU_SMOOTHER``, read at trace time: flipping
    it after an executable is cached needs ``jax.clear_caches()`` (jit
    caches key on arguments, not on the environment).
    """
    impl = os.environ.get("EMG3D_TPU_SMOOTHER", "auto")
    if impl not in ("xla", "blocked", "auto"):
        # 'blocked' only pays at sweep/nu granularity (gauss_seidel
        # de-interleaves once for 8*nu phases); a lone dense-array
        # phase runs the plain strided kernel.
        from emg3d_tpu.ops import pallas_gs
        interpret = impl == "pallas-interpret"
        if pallas_gs.use_tiled(ex, ey, ez, sx, sy, sz,
                               eta_x, eta_y, eta_z, zeta):
            # Fine levels: working set exceeds VMEM — stream (x, y)
            # tiles with double-buffered DMA.
            return pallas_gs.gauss_seidel_phase_pallas_tiled(
                ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
                hx, hy, hz, px, py, pz, interpret=interpret)
        return pallas_gs.gauss_seidel_phase_pallas(
            ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
            hx, hy, hz, px, py, pz, interpret=interpret)
    return _gauss_seidel_phase_xla(
        ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
        hx, hy, hz, px, py, pz)


def _phase_solve(gf, st, m, ih):
    """Assemble and solve the per-node 6x6 systems of one point phase.

    Layout-agnostic core shared by the strided-slice phase
    (:func:`_gauss_seidel_phase_xla`) and the parity-blocked phase
    (:mod:`emg3d_tpu.ops.blocked`): the caller provides the gathers,
    this function provides the physics (reference core.py:392-492).

    ``gf(name, i, j, k)`` gathers field/source component ``name`` on
    the phase block; each index is interpreted per the component's
    axis kinds (ex/sx: cell-node-node; ey/sy: node-cell-node; ez/sz:
    node-node-cell), cell offsets i in {0, 1}, node offsets in
    {-1, 0, 1}.  ``st`` are the six diagonal eta sums (already /4),
    ``m`` the 24 averaged-zeta coefficients
    (:func:`_m_coefficients`), ``ih`` the broadcast inverse widths
    {ihxa, ihxb, ihym, ihyp, ihzm, ihzp}.  Returns the six solution
    blocks [ex-, ex+, ey-, ey+, ez-, ez+].
    """
    st0, st1, st2, st3, st4, st5 = st
    ihxa, ihxb = ih["ihxa"], ih["ihxb"]
    ihym, ihyp = ih["ihym"], ih["ihyp"]
    ihzm, ihzp = ih["ihzm"], ih["ihzp"]

    # 6x6 system rows on the phase block (lower+upper by symmetry;
    # core.py:392-430).
    zero = jnp.zeros(jnp.broadcast_shapes(st0.shape, m["zyRxm"].shape),
                     dtype=st0.dtype)

    a00 = (-st0 + m["zyRxm"] * ihyp + m["zyLxm"] * ihym
           + m["yzRxm"] * ihzp + m["yzLxm"] * ihzm)
    a11 = (-st1 + m["zyRxp"] * ihyp + m["zyLxp"] * ihym
           + m["yzRxp"] * ihzp + m["yzLxp"] * ihzm)
    a22 = (-st2 + m["zxRym"] * ihxb + m["zxLym"] * ihxa
           + m["xzRym"] * ihzp + m["xzLym"] * ihzm)
    a33 = (-st3 + m["zxRyp"] * ihxb + m["zxLyp"] * ihxa
           + m["xzRyp"] * ihzp + m["xzLyp"] * ihzm)
    a44 = (-st4 + m["yxRzm"] * ihxb + m["yxLzm"] * ihxa
           + m["xyRzm"] * ihyp + m["xyLzm"] * ihym)
    a55 = (-st5 + m["yxRzp"] * ihxb + m["yxLzp"] * ihxa
           + m["xyRzp"] * ihyp + m["xyLzp"] * ihym)

    a20 = -m["zyLxm"] * ihxa + zero
    a30 = m["zyRxm"] * ihxa + zero
    a40 = -m["yzLxm"] * ihxa + zero
    a50 = m["yzRxm"] * ihxa + zero
    a21 = m["zyLxp"] * ihxb + zero
    a31 = -m["zyRxp"] * ihxb + zero
    a41 = m["yzLxp"] * ihxb + zero
    a51 = -m["yzRxp"] * ihxb + zero
    a42 = -m["xzLym"] * ihym + zero
    a52 = m["xzRym"] * ihym + zero
    a43 = m["xzLyp"] * ihyp + zero
    a53 = -m["xzRyp"] * ihyp + zero
    a10 = a32 = a54 = zero

    rows = [
        jnp.stack([a00, a10, a20, a30, a40, a50], axis=-1),
        jnp.stack([a10, a11, a21, a31, a41, a51], axis=-1),
        jnp.stack([a20, a21, a22, a32, a42, a52], axis=-1),
        jnp.stack([a30, a31, a32, a33, a43, a53], axis=-1),
        jnp.stack([a40, a41, a42, a43, a44, a54], axis=-1),
        jnp.stack([a50, a51, a52, a53, a54, a55], axis=-1),
    ]

    # rhs = b - (couplings to all 12 non-node edges); core.py:432-492.
    # Cell-axis offsets: 0 = minus cell (i-1), 1 = plus cell (i);
    # node-axis offsets: -1/0/+1 relative to the node.
    r0 = (gf("sx", 0, 0, 0)
          + m["zyRxm"] * (gf("ey", -1, 1, 0) * ihxa
                          + gf("ex", 0, 1, 0) * ihyp)
          + m["zyLxm"] * (-gf("ey", -1, 0, 0) * ihxa
                          + gf("ex", 0, -1, 0) * ihym)
          + m["yzRxm"] * (gf("ez", -1, 0, 1) * ihxa
                          + gf("ex", 0, 0, 1) * ihzp)
          + m["yzLxm"] * (-gf("ez", -1, 0, 0) * ihxa
                          + gf("ex", 0, 0, -1) * ihzm))

    r1 = (gf("sx", 1, 0, 0)
          + m["zyRxp"] * (-gf("ey", 1, 1, 0) * ihxb
                          + gf("ex", 1, 1, 0) * ihyp)
          + m["zyLxp"] * (gf("ey", 1, 0, 0) * ihxb
                          + gf("ex", 1, -1, 0) * ihym)
          + m["yzRxp"] * (-gf("ez", 1, 0, 1) * ihxb
                          + gf("ex", 1, 0, 1) * ihzp)
          + m["yzLxp"] * (gf("ez", 1, 0, 0) * ihxb
                          + gf("ex", 1, 0, -1) * ihzm))

    r2 = (gf("sy", 0, 0, 0)
          + m["zxRym"] * (gf("ey", 1, 0, 0) * ihxb
                          + gf("ex", 1, -1, 0) * ihym)
          + m["zxLym"] * (gf("ey", -1, 0, 0) * ihxa
                          - gf("ex", 0, -1, 0) * ihym)
          + m["xzRym"] * (gf("ez", 0, -1, 1) * ihym
                          + gf("ey", 0, 0, 1) * ihzp)
          + m["xzLym"] * (-gf("ez", 0, -1, 0) * ihym
                          + gf("ey", 0, 0, -1) * ihzm))

    r3 = (gf("sy", 0, 1, 0)
          + m["zxRyp"] * (gf("ey", 1, 1, 0) * ihxb
                          - gf("ex", 1, 1, 0) * ihyp)
          + m["zxLyp"] * (gf("ey", -1, 1, 0) * ihxa
                          + gf("ex", 0, 1, 0) * ihyp)
          + m["xzRyp"] * (-gf("ez", 0, 1, 1) * ihyp
                          + gf("ey", 0, 1, 1) * ihzp)
          + m["xzLyp"] * (gf("ez", 0, 1, 0) * ihyp
                          + gf("ey", 0, 1, -1) * ihzm))

    r4 = (gf("sz", 0, 0, 0)
          + m["yxRzm"] * (gf("ez", 1, 0, 0) * ihxb
                          + gf("ex", 1, 0, -1) * ihzm)
          + m["yxLzm"] * (gf("ez", -1, 0, 0) * ihxa
                          - gf("ex", 0, 0, -1) * ihzm)
          + m["xyRzm"] * (gf("ez", 0, 1, 0) * ihyp
                          + gf("ey", 0, 1, -1) * ihzm)
          + m["xyLzm"] * (gf("ez", 0, -1, 0) * ihym
                          - gf("ey", 0, 0, -1) * ihzm))

    r5 = (gf("sz", 0, 0, 1)
          + m["yxRzp"] * (gf("ez", 1, 0, 1) * ihxb
                          - gf("ex", 1, 0, 1) * ihzp)
          + m["yxLzp"] * (gf("ez", -1, 0, 1) * ihxa
                          + gf("ex", 0, 0, 1) * ihzp)
          + m["xyRzp"] * (gf("ez", 0, 1, 1) * ihyp
                          - gf("ey", 0, 1, 1) * ihzp)
          + m["xyLzp"] * (gf("ez", 0, -1, 1) * ihym
                          + gf("ey", 0, 0, 1) * ihzp))

    return _solve6(rows, [r0, r1, r2, r3, r4, r5])


def _gauss_seidel_phase_xla(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z,
                            zeta, hx, hy, hz, px, py, pz):
    """jax.numpy phase kernel: assemble and solve the 6x6 node systems
    (reference core.py:392-492) for the stride-2 node subgrid with
    (ix-1, iy-1, iz-1) ≡ (px, py, pz) mod 2.  All coefficients are
    computed directly on the phase block (composed strided slices of
    the inputs), so a phase's XLA graph carries ~1/8 of a sweep's work.
    """
    nx, ny, nz = hx.size, hy.size, hz.size

    kx, ky, kz = 0.5 / hx, 0.5 / hy, 0.5 / hz
    ihx, ihy, ihz = 1.0 / hx, 1.0 / hy, 1.0 / hz

    # Slice helpers on the phase's stride-2 node subgrid.
    def csl(o, n, p):   # cell-type slice at the phase nodes: o in {0, 1}.
        return slice(o + p, n - 1 + o, 2)

    def nsl(d, n, p):   # node-type slice: d in {-1, 0, 1}.
        return slice(1 + d + p, n + d, 2)

    xa, xb = csl(0, nx, px), csl(1, nx, px)
    ym, yp = csl(0, ny, py), csl(1, ny, py)
    zm, zp = csl(0, nz, pz), csl(1, nz, pz)

    # Coefficient broadcasts on the phase block.
    kxa = kx[xa][:, None, None]
    kxb = kx[xb][:, None, None]
    kym = ky[ym][None, :, None]
    kyp = ky[yp][None, :, None]
    kzm = kz[zm][None, None, :]
    kzp = kz[zp][None, None, :]
    ih = {
        "ihxa": ihx[xa][:, None, None], "ihxb": ihx[xb][:, None, None],
        "ihym": ihy[ym][None, :, None], "ihyp": ihy[yp][None, :, None],
        "ihzm": ihz[zm][None, None, :], "ihzp": ihz[zp][None, None, :],
    }

    # zeta gathers on the phase block (composed slices of the full
    # gathers zeta[:-1]/zeta[1:] + {m,p} y/z offsets).
    z = {}
    for xk, xs in (("a", xa), ("b", xb)):
        z[xk + "mm"] = zeta[xs, ym, zm]
        z[xk + "mp"] = zeta[xs, ym, zp]
        z[xk + "pm"] = zeta[xs, yp, zm]
        z[xk + "pp"] = zeta[xs, yp, zp]
    m = _m_coefficients(z, kxa, kxb, kym, kyp, kzm, kzp)

    # Diagonal eta sums (divided by 4, reference core.py:390).
    def st(eta, s0, s1, s2, ax):
        # 4-cell sum over the two axes != ax, at phase offsets.
        sls = [s0, s1, s2]
        out = 0.0
        for d1 in (0, 1):
            for d2 in (0, 1):
                idx = list(sls)
                others = [i for i in range(3) if i != ax]
                n_ = (nx, ny, nz)
                p_ = (px, py, pz)
                idx[others[0]] = csl(d1, n_[others[0]], p_[others[0]])
                idx[others[1]] = csl(d2, n_[others[1]], p_[others[1]])
                out = out + eta[tuple(idx)]
        return out / 4.0

    st0 = st(eta_x, xa, None, None, 0)
    st1 = st(eta_x, xb, None, None, 0)
    st2 = st(eta_y, None, ym, None, 1)
    st3 = st(eta_y, None, yp, None, 1)
    st4 = st(eta_z, None, None, zm, 2)
    st5 = st(eta_z, None, None, zp, 2)

    fld = {"ex": ex, "ey": ey, "ez": ez, "sx": sx, "sy": sy, "sz": sz}
    kinds = {"ex": "cnn", "sx": "cnn", "ey": "ncn", "sy": "ncn",
             "ez": "nnc", "sz": "nnc"}

    def gf(name, i, j, k):
        kd = kinds[name]
        sls = []
        for v, knd, n, p in zip((i, j, k), kd, (nx, ny, nz),
                                (px, py, pz)):
            sls.append(csl(v, n, p) if knd == "c" else nsl(v, n, p))
        return fld[name][tuple(sls)]

    sol = _phase_solve(gf, (st0, st1, st2, st3, st4, st5), m, ih)

    # Scatter the solutions to the six adjacent edges of the phase's
    # nodes — disjoint strided targets, no masking needed.
    ex = ex.at[csl(0, nx, px), nsl(0, ny, py), nsl(0, nz, pz)].set(sol[0])
    ex = ex.at[csl(1, nx, px), nsl(0, ny, py), nsl(0, nz, pz)].set(sol[1])
    ey = ey.at[nsl(0, nx, px), csl(0, ny, py), nsl(0, nz, pz)].set(sol[2])
    ey = ey.at[nsl(0, nx, px), csl(1, ny, py), nsl(0, nz, pz)].set(sol[3])
    ez = ez.at[nsl(0, nx, px), nsl(0, ny, py), csl(0, nz, pz)].set(sol[4])
    ez = ez.at[nsl(0, nx, px), nsl(0, ny, py), csl(1, nz, pz)].set(sol[5])
    return ex, ey, ez


# -------------------------------------------------------------------------
# 4-color line relaxation (reference gauss_seidel_{x,y,z} + blocks_to_amat
# + banded solve, core.py:506-1616), expressed as batched block-tridiagonal
# (5x5 blocks) solves.
# -------------------------------------------------------------------------

def _line_relax_x(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
                  hx, hy, hz, nu, reverse=False, single_sweep=False):
    """Line relaxation along x, 4-colored over (y, z) line parities.

    Thin loop over :func:`_line_relax_x_phase` (one executable per
    phase when jitted by the solver, shared between sweep orders).
    """
    ny, nz = hy.size, hz.size
    colors = [(py, pz) for pz, py in itertools.product((0, 1), repeat=2)
              if py < ny - 1 and pz < nz - 1]

    fields = (ex, ey, ez)
    args = (sx, sy, sz, eta_x, eta_y, eta_z, zeta, hx, hy, hz)
    if single_sweep:
        order = colors[::-1] if reverse else colors
        for c in order:
            fields = _line_relax_x_phase(*fields, *args, *c)
        return fields
    for sweep in range(nu):
        order = colors if sweep % 2 == 0 else colors[::-1]
        for c in order:
            fields = _line_relax_x_phase(*fields, *args, *c)
    return fields


def _line_x_system(gf, xc, py, pz, cdtype):
    """Assemble the block-tridiagonal x-line systems of one phase.

    Layout-agnostic core shared by the strided-slice phase
    (:func:`_line_relax_x_phase`) and the parity-blocked phase
    (:mod:`emg3d_tpu.ops.blocked`): the caller provides the gathers,
    this function provides the physics (reference core.py:680-766).

    ``gf(name, pat, ty, tz)`` gathers operand ``name`` (ex/ey/ez,
    sx/sy/sz, eta_x/eta_y/eta_z, zeta) as an (X, ncy, ncz) array:
    x pattern ``pat`` is ``'a'`` (x index = the group index g) or
    ``'b'`` (x index = min(g+1, nx-1)); (ty, tz) are the DENSE start
    indices of the stride-2 transverse windows (lengths fixed by the
    phase).  ``xc`` carries the broadcast width coefficients: columns
    kxa/kxb/ihxa/ihxb of shape (X, 1, 1) and transverse rows
    kym/kyp/kzm/kzp/ihym/ihyp/ihzm/ihzp.

    Returns ``(mid, left, rhs)`` — the 5x5 diagonal/sub-diagonal block
    stacks and the rhs, WITHOUT the last-group fix (the caller applies
    :func:`_line_last_group_fix` to whichever stack holds the global
    last group).  Unknown order per group g: [ex(g), ey-, ey+, ez-,
    ez+] at node g+1.
    """
    kxa, kxb = xc["kxa"], xc["kxb"]
    ihxa, ihxb = xc["ihxa"], xc["ihxb"]
    kym, kyp, kzm, kzp = xc["kym"], xc["kyp"], xc["kzm"], xc["kzp"]
    ihym, ihyp = xc["ihym"], xc["ihyp"]
    ihzm, ihzp = xc["ihzm"], xc["ihzp"]

    # Dense start indices of the phase windows: cell-type (m/p) and
    # node-type (ycN/ypN/ymN — same starts serve ymC/ypC/zmC/zpC).
    ym, yp, zm, zp = py, 1 + py, pz, 1 + pz
    ycN, ypN, ymN = 1 + py, 2 + py, py
    zcN, zpN, zmN = 1 + pz, 2 + pz, pz

    z = {}
    for xk in ("a", "b"):
        z[xk + "mm"] = gf("zeta", xk, ym, zm)
        z[xk + "mp"] = gf("zeta", xk, ym, zp)
        z[xk + "pm"] = gf("zeta", xk, yp, zm)
        z[xk + "pp"] = gf("zeta", xk, yp, zp)
    m = _m_coefficients(z, kxa, kxb, kym, kyp, kzm, kzp)

    st0 = (gf("eta_x", "a", ym, zm) + gf("eta_x", "a", yp, zm)
           + gf("eta_x", "a", ym, zp) + gf("eta_x", "a", yp, zp)) / 4.0
    st2 = (gf("eta_y", "b", ym, zm) + gf("eta_y", "b", ym, zp)
           + gf("eta_y", "a", ym, zm) + gf("eta_y", "a", ym, zp)) / 4.0
    st3 = (gf("eta_y", "b", yp, zm) + gf("eta_y", "b", yp, zp)
           + gf("eta_y", "a", yp, zm) + gf("eta_y", "a", yp, zp)) / 4.0
    st4 = (gf("eta_z", "b", yp, zm) + gf("eta_z", "b", ym, zm)
           + gf("eta_z", "a", yp, zm) + gf("eta_z", "a", ym, zm)) / 4.0
    st5 = (gf("eta_z", "b", yp, zp) + gf("eta_z", "b", ym, zp)
           + gf("eta_z", "a", yp, zp) + gf("eta_z", "a", ym, zp)) / 4.0

    blk = jnp.broadcast_shapes(st0.shape, m["zyRxm"].shape)
    zero = jnp.zeros(blk, dtype=cdtype)

    def bc(v):
        return jnp.broadcast_to(v, blk).astype(cdtype)

    # Diagonal 5x5 block ``middle`` (core.py:680-711).
    m00 = bc(-st0 + m["zyRxm"] * ihyp + m["zyLxm"] * ihym
             + m["yzRxm"] * ihzp + m["yzLxm"] * ihzm)
    m11 = bc(-st2 + m["zxRym"] * ihxb + m["zxLym"] * ihxa
             + m["xzRym"] * ihzp + m["xzLym"] * ihzm)
    m22 = bc(-st3 + m["zxRyp"] * ihxb + m["zxLyp"] * ihxa
             + m["xzRyp"] * ihzp + m["xzLyp"] * ihzm)
    m33 = bc(-st4 + m["yxRzm"] * ihxb + m["yxLzm"] * ihxa
             + m["xyRzm"] * ihyp + m["xyLzm"] * ihym)
    m44 = bc(-st5 + m["yxRzp"] * ihxb + m["yxLzp"] * ihxa
             + m["xyRzp"] * ihyp + m["xyLzp"] * ihym)
    m10 = bc(-m["zyLxm"] * ihxa)
    m20 = bc(m["zyRxm"] * ihxa)
    m30 = bc(-m["yzLxm"] * ihxa)
    m40 = bc(m["yzRxm"] * ihxa)
    m31 = bc(-m["xzLym"] * ihym)
    m41 = bc(m["xzRym"] * ihym)
    m32 = bc(m["xzLyp"] * ihyp)
    m42 = bc(-m["xzRyp"] * ihyp)

    mid = jnp.stack([
        jnp.stack([m00, m10, m20, m30, m40], axis=-1),
        jnp.stack([m10, m11, zero, m31, m41], axis=-1),
        jnp.stack([m20, zero, m22, m32, m42], axis=-1),
        jnp.stack([m30, m31, m32, m33, zero], axis=-1),
        jnp.stack([m40, m41, m42, zero, m44], axis=-1),
    ], axis=-2)

    # Sub-diagonal block ``left`` (coupling to group g-1; core.py:713-721):
    # row 0 couples ex(g) to [ey-, ey+, ez-, ez+] of group g-1, and the
    # transverse edges couple to their left x-neighbour on the diagonal.
    l01 = bc(m["zyLxm"] * ihxa)
    l02 = bc(-m["zyRxm"] * ihxa)
    l03 = bc(m["yzLxm"] * ihxa)
    l04 = bc(-m["yzRxm"] * ihxa)
    l11 = bc(-m["zxLym"] * ihxa)
    l22 = bc(-m["zxLyp"] * ihxa)
    l33 = bc(-m["yxLzm"] * ihxa)
    l44 = bc(-m["yxLzp"] * ihxa)

    left = jnp.stack([
        jnp.stack([zero, l01, l02, l03, l04], axis=-1),
        jnp.stack([zero, l11, zero, zero, zero], axis=-1),
        jnp.stack([zero, zero, l22, zero, zero], axis=-1),
        jnp.stack([zero, zero, zero, l33, zero], axis=-1),
        jnp.stack([zero, zero, zero, zero, l44], axis=-1),
    ], axis=-2)

    # Off-line couplings moved to the rhs (core.py:723-766).
    r0 = (gf("sx", "a", ycN, zcN)
          + m["zyRxm"] * gf("ex", "a", ypN, zcN) * ihyp
          + m["zyLxm"] * gf("ex", "a", ymN, zcN) * ihym
          + m["yzRxm"] * gf("ex", "a", ycN, zpN) * ihzp
          + m["yzLxm"] * gf("ex", "a", ycN, zmN) * ihzm)

    r1 = (gf("sy", "b", ym, zcN)
          + (m["zxRym"] * gf("ex", "b", ymN, zcN)
             - m["zxLym"] * gf("ex", "a", ymN, zcN)
             + m["xzRym"] * gf("ez", "b", ymN, zp)
             - m["xzLym"] * gf("ez", "b", ymN, zm)) * ihym
          + m["xzRym"] * gf("ey", "b", ym, zpN) * ihzp
          + m["xzLym"] * gf("ey", "b", ym, zmN) * ihzm)

    r2 = (gf("sy", "b", yp, zcN)
          + (m["zxLyp"] * gf("ex", "a", ypN, zcN)
             - m["zxRyp"] * gf("ex", "b", ypN, zcN)
             + m["xzLyp"] * gf("ez", "b", ypN, zm)
             - m["xzRyp"] * gf("ez", "b", ypN, zp)) * ihyp
          + m["xzRyp"] * gf("ey", "b", yp, zpN) * ihzp
          + m["xzLyp"] * gf("ey", "b", yp, zmN) * ihzm)

    r3 = (gf("sz", "b", ycN, zm)
          + (m["yxRzm"] * gf("ex", "b", ycN, zmN)
             - m["yxLzm"] * gf("ex", "a", ycN, zmN)
             + m["xyRzm"] * gf("ey", "b", yp, zmN)
             - m["xyLzm"] * gf("ey", "b", ym, zmN)) * ihzm
          + m["xyRzm"] * gf("ez", "b", ypN, zm) * ihyp
          + m["xyLzm"] * gf("ez", "b", ymN, zm) * ihym)

    r4 = (gf("sz", "b", ycN, zp)
          + (m["yxLzp"] * gf("ex", "a", ycN, zpN)
             - m["yxRzp"] * gf("ex", "b", ycN, zpN)
             + m["xyLzp"] * gf("ey", "b", ym, zpN)
             - m["xyRzp"] * gf("ey", "b", yp, zpN)) * ihzp
          + m["xyRzp"] * gf("ez", "b", ypN, zp) * ihyp
          + m["xyLzp"] * gf("ez", "b", ymN, zp) * ihym)

    rhs = jnp.stack([bc(r0), bc(r1), bc(r2), bc(r3), bc(r4)], axis=-1)
    return mid, left, rhs


def _line_last_group_fix(mid, left, rhs):
    """Apply the last-x-group reduction (reference core.py:1467-1477).

    The last group (g = nx-1) holds only the ex unknown: identity-pad
    the other four rows of its diagonal block, keep only row 0 of its
    ``left`` coupling, and zero the non-ex rhs entries.
    """
    cdtype = mid.dtype
    eye_pad = jnp.eye(5, dtype=cdtype).at[0, 0].set(0.0)
    last_mid = (jnp.zeros((5, 5), dtype=cdtype).at[0, 0].set(1.0)
                * mid[-1, ..., 0, 0][..., None, None] + eye_pad)
    mid = mid.at[-1].set(last_mid)
    left = left.at[-1, :, :, 1:, :].set(0.0)
    rhs = rhs.at[-1, :, :, 1:].set(0.0)
    return mid, left, rhs


def _line_relax_x_phase(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z,
                        zeta, hx, hy, hz, py, pz):
    """Relax the x-lines at interior (y, z) nodes of parity (py, pz).

    Builds the block-tridiagonal line systems (5x5 ``middle``/``left``
    blocks, reference core.py:680-721) directly on the phase block
    (composed strided slices via :func:`_line_x_system`), then solves
    all lines of the color with one batched block-Thomas elimination.
    """
    nx, ny, nz = hx.size, hy.size, hz.size
    cdtype = ex.dtype
    ncy, ncz = (ny - py) // 2, (nz - pz) // 2

    # x-gathers: a = g (the group index, 0..nx-1), b = min(g+1, nx-1).
    idx_b = jnp.minimum(jnp.arange(nx) + 1, nx - 1)
    hx_b = hx[idx_b]

    def trow(v, t, nc):
        return v[t:t + 2 * nc:2]

    xc = {
        "kxa": (0.5 / hx)[:, None, None],
        "kxb": (0.5 / hx_b)[:, None, None],
        "ihxa": (1.0 / hx)[:, None, None],
        "ihxb": (1.0 / hx_b)[:, None, None],
        "kym": trow(0.5 / hy, py, ncy)[None, :, None],
        "kyp": trow(0.5 / hy, 1 + py, ncy)[None, :, None],
        "kzm": trow(0.5 / hz, pz, ncz)[None, None, :],
        "kzp": trow(0.5 / hz, 1 + pz, ncz)[None, None, :],
        "ihym": trow(1.0 / hy, py, ncy)[None, :, None],
        "ihyp": trow(1.0 / hy, 1 + py, ncy)[None, :, None],
        "ihzm": trow(1.0 / hz, pz, ncz)[None, None, :],
        "ihzp": trow(1.0 / hz, 1 + pz, ncz)[None, None, :],
    }

    fld = {"ex": ex, "ey": ey, "ez": ez, "sx": sx, "sy": sy, "sz": sz,
           "eta_x": eta_x, "eta_y": eta_y, "eta_z": eta_z, "zeta": zeta}

    def gf(name, pat, ty, tz):
        xs = slice(0, nx) if pat == "a" else idx_b
        return fld[name][xs, ty:ty + 2 * ncy:2, tz:tz + 2 * ncz:2]

    mid, left, rhs = _line_x_system(gf, xc, py, pz, cdtype)
    mid, left, rhs = _line_last_group_fix(mid, left, rhs)

    u = _block_solve_lines(mid, left, rhs)

    # Scatter: the on-line ex and the four transverse edges at node g+1.
    ycN = slice(1 + py, ny, 2)
    ymC = slice(py, ny - 1, 2)
    ypC = slice(1 + py, ny, 2)
    zcN = slice(1 + pz, nz, 2)
    zmC = slice(pz, nz - 1, 2)
    zpC = slice(1 + pz, nz, 2)
    ex = ex.at[:, ycN, zcN].set(u[..., 0])
    ey = ey.at[1:nx, ymC, zcN].set(u[:-1, ..., 1])
    ey = ey.at[1:nx, ypC, zcN].set(u[:-1, ..., 2])
    ez = ez.at[1:nx, ycN, zmC].set(u[:-1, ..., 3])
    ez = ez.at[1:nx, ycN, zpC].set(u[:-1, ..., 4])
    return ex, ey, ez


def _block_solve_lines(mid, left, rhs):
    """Dispatch the batched block-tridiagonal line solve.

    ``EMG3D_TPU_LINE_SOLVER``: 'thomas' (default; sequential depth n,
    minimal work — right for CPUs) or 'pcr' (parallel cyclic reduction;
    depth log2(n) at ~log2(n)x the work — right for TPUs, where the
    scan's sequential latency, not FLOPs, floors the line relaxation).
    Read at TRACE time: set it before the first solve (already-compiled
    executables keep the solver they were traced with).
    """
    import os

    if os.environ.get("EMG3D_TPU_LINE_SOLVER", "thomas") == "pcr":
        return _block_pcr(mid, left, rhs)
    return _block_thomas(mid, left, rhs)


def _block_pcr(mid, left, rhs):
    """Block parallel cyclic reduction for the line systems.

    Same system as :func:`_block_thomas`: block-tridiagonal with
    diagonal blocks ``mid[g]``, sub-diagonal ``left[g]`` (coupling of
    row g to g−1) and super-diagonal ``left[g+1]^T`` (complex-symmetric
    system).  Each reduction step eliminates the couplings at distance
    d and doubles d; after ceil(log2 n) steps the system is block
    diagonal.  All rows update simultaneously — sequential depth
    ceil(log2 n) instead of 2n, at ~log2(n) times the block-op work
    (the TPU trade: latency for parallel FLOPs).

    No pivoting (as the reference's banded LDL^T, core.py:1481-1616);
    the multigrid smoother blocks are strongly diagonally dominated.
    """
    n = mid.shape[0]
    ii = jnp.broadcast_to(jnp.eye(5, dtype=mid.dtype), mid.shape[1:])

    def shift(a, d, fill):
        """a[g+d] with ``fill`` rows where g+d is out of range."""
        if d >= n or -d >= n:
            return jnp.broadcast_to(fill, a.shape).astype(a.dtype)
        filler = jnp.broadcast_to(
            fill, (abs(d),) + a.shape[1:]).astype(a.dtype)
        if d > 0:
            return jnp.concatenate([a[d:], filler], axis=0)
        return jnp.concatenate([filler, a[:d]], axis=0)

    dd = mid
    ll = left.at[0].set(0.0)
    uu = jnp.swapaxes(shift(left, 1, jnp.zeros((5, 5), left.dtype)),
                      -1, -2)
    bb = rhs

    d = 1
    while d < n:
        z55 = jnp.zeros((5, 5), dd.dtype)
        dm = shift(dd, -d, jnp.eye(5, dtype=dd.dtype))
        dp = shift(dd, +d, jnp.eye(5, dtype=dd.dtype))
        lm = shift(ll, -d, z55)
        up = shift(uu, +d, z55)
        um = shift(uu, -d, z55)
        lp = shift(ll, +d, z55)
        bm = shift(bb, -d, jnp.zeros((5,), bb.dtype))
        bp = shift(bb, +d, jnp.zeros((5,), bb.dtype))

        # alpha = -L D_{g-d}^{-1}; beta = -U D_{g+d}^{-1}.  The D blocks
        # are complex symmetric, so D^{-T} = D^{-1} and
        # (L D^{-1})^T = D^{-1} L^T solves directly.
        alpha = -jnp.swapaxes(_solve5(dm, jnp.swapaxes(ll, -1, -2)),
                              -1, -2)
        beta = -jnp.swapaxes(_solve5(dp, jnp.swapaxes(uu, -1, -2)),
                             -1, -2)

        mm = jnp.einsum("...ij,...jk->...ik", alpha, um)
        pp = jnp.einsum("...ij,...jk->...ik", beta, lp)
        dd = dd + mm + pp
        bb = (bb + jnp.einsum("...ij,...j->...i", alpha, bm)
              + jnp.einsum("...ij,...j->...i", beta, bp))
        ll = jnp.einsum("...ij,...jk->...ik", alpha, lm)
        uu = jnp.einsum("...ij,...jk->...ik", beta, up)
        d *= 2

    return _solve5(dd, bb[..., None])[..., 0]


def _block_thomas(mid, left, rhs):
    """Solve batched block-tridiagonal systems (5x5 blocks) for all lines.

    Forward: C_g = M_g - L_g C_{g-1}^{-1} L_g^T; backward with the
    super-diagonal blocks L_{g+1}^T.  Batched over the line dimensions.
    """
    def fwd(carry, inp):
        c_prev, y_prev = carry
        m_g, l_g, r_g = inp
        # X = C_{g-1}^{-1} [L_g^T | y_{g-1}]
        rhs_cat = jnp.concatenate(
            [jnp.swapaxes(l_g, -1, -2), y_prev[..., None]], axis=-1)
        x = _solve5(c_prev, rhs_cat)
        ct = m_g - jnp.einsum("...ij,...jk->...ik", l_g, x[..., :5])
        y = r_g - jnp.einsum("...ij,...j->...i", l_g, x[..., 5])
        return (ct, y), (ct, y)

    (c0, y0) = (mid[0], rhs[0])
    (_, _), (cts, ys) = jax.lax.scan(
        fwd, (c0, y0), (mid[1:], left[1:], rhs[1:]),
        unroll=_scan_unroll(mid.shape[0] - 1))
    cts = jnp.concatenate([c0[None], cts], axis=0)
    ys = jnp.concatenate([y0[None], ys], axis=0)

    def bwd(u_next, inp):
        ct, y, l_next = inp
        r = y - jnp.einsum("...ji,...j->...i", l_next, u_next)
        u = _solve5(ct, r[..., None])[..., 0]
        return u, u

    u_last = _solve5(cts[-1], ys[-1][..., None])[..., 0]
    _, us = jax.lax.scan(
        bwd, u_last, (cts[:-1], ys[:-1], left[1:]), reverse=True,
        unroll=_scan_unroll(mid.shape[0] - 1))
    return jnp.concatenate([us, u_last[None]], axis=0)


def _block_thomas_paired(midE, leftE, rhsE, midO, leftO, rhsO):
    """Block-Thomas over x-parity-split stacks (even groups E, odd O).

    The same block-tridiagonal system as :func:`_block_thomas` with the
    rows interleaved E[0], O[0], E[1], O[1], ...; operating on the
    split stacks directly lets the parity-blocked line phase
    (:mod:`emg3d_tpu.ops.blocked`) skip materializing interleaved
    tensors.  Each scan step eliminates one (E, O) pair, so the
    sequential depth is the same 2n as the dense Thomas scan at half
    the scan length.  Returns ``(uE, uO)``.
    """
    nE, nO = midE.shape[0], midO.shape[0]
    eye = jnp.broadcast_to(jnp.eye(5, dtype=midE.dtype), midE.shape[1:])
    # Uniform pairing: pad E with one trailing identity group so that
    # nE == nO + 1 always (the dummy's left coupling is zero and its
    # solution is never read back).
    padded = nE == nO
    if padded:
        midE = jnp.concatenate([midE, eye[None]], axis=0)
        leftE = jnp.concatenate(
            [leftE, jnp.zeros_like(leftE[:1])], axis=0)
        rhsE = jnp.concatenate([rhsE, jnp.zeros_like(rhsE[:1])], axis=0)
        nE += 1
    # The first group has no left coupling.
    leftE = leftE.at[0].set(0.0)

    def elim(carry, m_g, l_g, r_g):
        c_prev, y_prev = carry
        rhs_cat = jnp.concatenate(
            [jnp.swapaxes(l_g, -1, -2), y_prev[..., None]], axis=-1)
        x = _solve5(c_prev, rhs_cat)
        ct = m_g - jnp.einsum("...ij,...jk->...ik", l_g, x[..., :5])
        y = r_g - jnp.einsum("...ij,...j->...i", l_g, x[..., 5])
        return ct, y

    def fwd(carry, inp):
        mE, lE, rE, mO, lO, rO = inp
        ctE, yE = elim(carry, mE, lE, rE)
        ctO, yO = elim((ctE, yE), mO, lO, rO)
        return (ctO, yO), (ctE, yE, ctO, yO)

    init = (eye, jnp.zeros(rhsE.shape[1:], dtype=rhsE.dtype))
    carry, (ctsE, ysE, ctsO, ysO) = jax.lax.scan(
        fwd, init, (midE[:nO], leftE[:nO], rhsE[:nO], midO, leftO, rhsO),
        unroll=_scan_unroll(nO))
    # Peel the final E group (the global last group, or the dummy pad).
    ctL, yL = elim(carry, midE[nO], leftE[nO], rhsE[nO])
    uL = _solve5(ctL, yL[..., None])[..., 0]

    def bwd(u_next, inp):
        # u_next = uE[k+1]; back-substitute uO[k] then uE[k].
        ctE, yE, ctO, yO, lE_next, lO = inp
        rO = yO - jnp.einsum("...ji,...j->...i", lE_next, u_next)
        uO = _solve5(ctO, rO[..., None])[..., 0]
        rE = yE - jnp.einsum("...ji,...j->...i", lO, uO)
        uE = _solve5(ctE, rE[..., None])[..., 0]
        return uE, (uE, uO)

    _, (usE, usO) = jax.lax.scan(
        bwd, uL, (ctsE, ysE, ctsO, ysO, leftE[1:nO + 1], leftO),
        reverse=True, unroll=_scan_unroll(nO))
    uE = jnp.concatenate([usE, uL[None]], axis=0)
    if padded:
        uE = uE[:-1]
    return uE, usO


def resolve_impl():
    """The smoother layout selected by ``EMG3D_TPU_SMOOTHER``.

    'auto' (the default) resolves to 'blocked' on the CPU backend and
    'xla' elsewhere — read at TRACE time (flipping the knob after an
    executable is cached needs ``jax.clear_caches()``).
    """
    impl = os.environ.get("EMG3D_TPU_SMOOTHER", "auto")
    if impl == "auto":
        return "blocked" if jax.default_backend() == "cpu" else "xla"
    return impl


def gauss_seidel_line(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
                      hx, hy, hz, nu, axis):
    """Line relaxation along ``axis``: nu sweeps, alternating order."""
    fields = (ex, ey, ez)
    for sweep in range(nu):
        fields = gauss_seidel_line_sweep(
            *fields, sx, sy, sz, eta_x, eta_y, eta_z, zeta,
            hx, hy, hz, sweep % 2 == 1, axis)
    return fields


def gauss_seidel_line_sweep(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z,
                            zeta, hx, hy, hz, reverse, axis):
    """One 4-color line-relaxation sweep along ``axis`` (0, 1, or 2).

    The y-/z-variants are the x-variant applied in a permuted frame: the
    discrete curl-curl operator is covariant under coordinate permutation
    (replaces the reference's hand-written gauss_seidel_y/gauss_seidel_z,
    core.py:786-1348).
    """
    kw = dict(nu=1, reverse=reverse, single_sweep=True)
    if axis == 0:
        return _line_relax_x(ex, ey, ez, sx, sy, sz, eta_x, eta_y, eta_z,
                             zeta, hx, hy, hz, **kw)

    if axis == 1:
        tp = (1, 0, 2)
        out = _line_relax_x(
            ey.transpose(tp), ex.transpose(tp), ez.transpose(tp),
            sy.transpose(tp), sx.transpose(tp), sz.transpose(tp),
            eta_y.transpose(tp), eta_x.transpose(tp), eta_z.transpose(tp),
            zeta.transpose(tp), hy, hx, hz, **kw)
        ey2, ex2, ez2 = out
        return ex2.transpose(tp), ey2.transpose(tp), ez2.transpose(tp)

    if axis == 2:
        tp = (2, 1, 0)
        out = _line_relax_x(
            ez.transpose(tp), ey.transpose(tp), ex.transpose(tp),
            sz.transpose(tp), sy.transpose(tp), sx.transpose(tp),
            eta_z.transpose(tp), eta_y.transpose(tp), eta_x.transpose(tp),
            zeta.transpose(tp), hz, hy, hx, **kw)
        ez2, ey2, ex2 = out
        return ex2.transpose(tp), ey2.transpose(tp), ez2.transpose(tp)

    raise ValueError(f"axis must be 0, 1, or 2; got {axis}.")
