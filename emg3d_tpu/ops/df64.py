"""Double-single ("df64") residual evaluation for float32 TPUs.

TPUs have no float64 ALU; a float32 multigrid solve floors at a relative
residual of ~4e-6 because the residual r = s - A e is itself evaluated in
float32: once ||r|| ~ eps32 * || |A||e| ||, the computed residual is
rounding noise and further cycles cannot improve the true residual.  The
reference never faces this (complex128 on CPU throughout).

The TPU-native remedy implemented here: evaluate the residual once per
cycle in *double-single* arithmetic — every value carried as an
unevaluated pair (hi, lo) of float32 with error-free transformations
(Dekker/Knuth two_sum / two_prod) — which yields ~48 bits of effective
mantissa at float32 speed on the VPU.  The operator coefficients (eta,
zeta, 1/h) are split into (hi, lo) pairs from their float64 host values
at hierarchy build time, so the system whose residual is driven to zero
is the float64 discretization itself, not a float32 perturbation of it.
Combined with the split-field accumulation of the iterate
(solver._accumulate_jit), the solver reaches 1e-6..1e-8 relative
residuals with all smoothing work in fast float32.

Mirrors the stencil structure of ops.operator.amat_x (reference
emg3d/core.py:57-206).
"""

import jax.numpy as jnp

__all__ = ["residual_norm_split_df64", "split_f64", "scale_split",
           "jit_exact"]


def split_f64(a, float_dtype):
    """Split a float64/complex128 host array into an f32 (hi, lo) pair."""
    import numpy as np
    if np.iscomplexobj(a):
        cdt = np.complex64 if float_dtype == np.float32 else np.complex128
        hi = np.asarray(a, dtype=cdt)
        lo = np.asarray(a - hi.astype(a.dtype), dtype=cdt)
    else:
        hi = np.asarray(a, dtype=float_dtype)
        lo = np.asarray(a - hi.astype(a.dtype), dtype=float_dtype)
    return hi, lo


def _split_const(dtype):
    # 2^ceil(p/2) + 1 Dekker splitter: f32 (p=24) -> 4097; f64 -> 2^27+1.
    if dtype == jnp.float32:
        return 4097.0
    return 134217729.0


def jit_exact(fun, **jit_kw):
    """``jax.jit`` for programs whose value depends on exact fp order.

    XLA:CPU's MLIR *fusion emitters* (default since jax 0.9) generate
    value-unsafe code inside fused loops — measured here: a jit of the
    split residual returned per-element values off by a full ulp of
    ``|A||e|`` vs its own eager execution, silently demoting the df64
    evaluation to ~f32 accuracy.  The legacy emitters are value-exact
    (validated: eager == jit bit-for-bit with
    ``--xla_cpu_use_fusion_emitters=false``), so executables built
    through this wrapper disable them via per-executable compiler
    options.  This costs ~4.5x on the affected executable on CPU, but
    only the once-per-cycle residual/accumulate programs need it —
    smoothing (the runtime bulk) has no EFT arithmetic.  On non-CPU
    backends the option is an inert DebugOptions field.
    """
    import jax

    return jax.jit(fun, compiler_options={
        "xla_cpu_use_fusion_emitters": False}, **jit_kw)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _fast_two_sum(a, b):
    """Requires |a| >= |b| (guaranteed after a renormalizing two_sum)."""
    s = a + b
    return s, b - (s - a)


def _two_prod(a, b):
    p = a * b
    c = _split_const(jnp.result_type(a))
    at = a * c
    ah = at - (at - a)
    al = a - ah
    bt = b * c
    bh = bt - (bt - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def scale_split(hi, lo, sc_hi, sc_lo):
    """Scale a split pair by a split scalar: (hi, lo) * (sc_hi, sc_lo).

    Returns a renormalized (hi2, lo2) pair representing the full-
    precision product to ~2x working mantissa — used by the batched
    shared-eta hierarchy (parallel.batch._scaled) so a scaled task's
    coefficients keep df64 accuracy for the split residual.  Handles
    complex values by df-multiplying the real/imaginary parts.
    """
    if jnp.iscomplexobj(hi):
        xr = (jnp.real(hi), jnp.real(lo))
        xi = (jnp.imag(hi), jnp.imag(lo))
        cr = (jnp.real(sc_hi), jnp.real(sc_lo))
        ci = (jnp.imag(sc_hi), jnp.imag(sc_lo))
        yr = _df_sub(_df_mul(xr, cr), _df_mul(xi, ci))
        yi = _df_add(_df_mul(xr, ci), _df_mul(xi, cr))
        return yr[0] + 1j * yi[0], yr[1] + 1j * yi[1]
    return _df_mul((hi, lo), (sc_hi, sc_lo))


# A "df" value is a tuple (hi, lo) of same-shape real arrays.

def _df(a):
    return (a, jnp.zeros_like(a))


def _df_add(x, y):
    s, e = _two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return _fast_two_sum(s, e)


def _df_sub(x, y):
    return _df_add(x, (-y[0], -y[1]))


def _df_mul(x, y):
    p, e = _two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return _fast_two_sum(p, e)


def _df_scale(x, c):
    """df * exact power-of-two scalar (error-free)."""
    return (x[0] * c, x[1] * c)


def _sl(x, sl):
    return (x[0][sl], x[1][sl])


def _df_bcast(x, shape_sel):
    """Broadcast a 1-D df pair into a 3-D broadcast form."""
    return (x[0][shape_sel], x[1][shape_sel])


def _shift_down_clamped_df(x, axis):
    """df version of operator._shift_down_clamped."""
    def f(a):
        first = jnp.take(a, jnp.array([0]), axis=axis)
        rest = jnp.take(a, jnp.arange(a.shape[axis] - 1), axis=axis)
        return jnp.concatenate([first, rest], axis=axis)
    return (f(x[0]), f(x[1]))


def _pair_clamped_df(p, axis):
    """df of p[i-1] + p[i] (clamped) along ``axis``; p is a df array."""
    def pad(a):
        first = jnp.take(a, jnp.array([0]), axis=axis)
        last = jnp.take(a, jnp.array([a.shape[axis] - 1]), axis=axis)
        return jnp.concatenate([first, a, last], axis=axis)
    n = p[0].shape[axis] + 1
    padded = (pad(p[0]), pad(p[1]))
    lo_part = _sl(padded, tuple([slice(None)] * axis + [slice(0, n)]))
    hi_part = _sl(padded, tuple([slice(None)] * axis + [slice(1, n + 1)]))
    return _df_add(lo_part, hi_part)


def _sum_pairs_clamped_df(p, axis):
    """df of p[i] + p[i-1] (clamped at 0); p a df array, same length."""
    return _df_add(p, _shift_down_clamped_df(p, axis))


def _curlcurl_df(ex, ey, ez, zx, zy, zz, ihx, ihy, ihz, nx, ny, nz):
    """df64 curl(zeta curl e) on the cell-indexed edge block.

    ``ex/ey/ez`` df real fields (re or im part); ``zx/zy/zz`` df
    dual-averaged zeta; ``ih*`` df inverse widths (3-D broadcast pairs).
    Returns (rrx, rry, rrz) df with PEC rows zeroed, far planes zero.
    """
    v1 = _df_sub(_df_mul(_df_sub(_sl(ez, (slice(None), slice(1, None))),
                                 _sl(ez, (slice(None), slice(0, -1)))),
                         ihy),
                 _df_mul(_df_sub(
                     _sl(ey, (slice(None), slice(None), slice(1, None))),
                     _sl(ey, (slice(None), slice(None), slice(0, -1)))),
                     ihz))
    v2 = _df_sub(_df_mul(_df_sub(
        _sl(ex, (slice(None), slice(None), slice(1, None))),
        _sl(ex, (slice(None), slice(None), slice(0, -1)))), ihz),
        _df_mul(_df_sub(_sl(ez, (slice(1, None),)),
                        _sl(ez, (slice(0, -1),))), ihx))
    v3 = _df_sub(_df_mul(_df_sub(_sl(ey, (slice(1, None),)),
                                 _sl(ey, (slice(0, -1),))), ihx),
                 _df_mul(_df_sub(_sl(ex, (slice(None), slice(1, None))),
                                 _sl(ex, (slice(None), slice(0, -1)))),
                         ihy))

    u1 = _df_mul(v1, zx)
    u2 = _df_mul(v2, zy)
    u3 = _df_mul(v3, zz)

    u1c = _sl(u1, (slice(0, nx),))
    u2c = _sl(u2, (slice(None), slice(0, ny)))
    u3c = _sl(u3, (slice(None), slice(None), slice(0, nz)))

    u3_ihy = _df_mul(u3c, ihy)
    u2_ihz = _df_mul(u2c, ihz)
    u1_ihz = _df_mul(u1c, ihz)
    u3_ihx = _df_mul(u3c, ihx)
    u2_ihx = _df_mul(u2c, ihx)
    u1_ihy = _df_mul(u1c, ihy)

    rrx = _df_add(_df_sub(u3_ihy, _shift_down_clamped_df(u3_ihy, 1)),
                  _df_sub(_shift_down_clamped_df(u2_ihz, 2), u2_ihz))
    rry = _df_add(_df_sub(u1_ihz, _shift_down_clamped_df(u1_ihz, 2)),
                  _df_sub(_shift_down_clamped_df(u3_ihx, 0), u3_ihx))
    rrz = _df_add(_df_sub(u2_ihx, _shift_down_clamped_df(u2_ihx, 0)),
                  _df_sub(_shift_down_clamped_df(u1_ihy, 1), u1_ihy))

    def pec_x(a):
        return a.at[:, 0, :].set(0).at[:, :, 0].set(0)

    def pec_y(a):
        return a.at[0, :, :].set(0).at[:, :, 0].set(0)

    def pec_z(a):
        return a.at[0, :, :].set(0).at[:, 0, :].set(0)

    rrx = (pec_x(rrx[0]), pec_x(rrx[1]))
    rry = (pec_y(rry[0]), pec_y(rry[1]))
    rrz = (pec_z(rrz[0]), pec_z(rrz[1]))
    return rrx, rry, rrz


def residual_norm_split_df64(e_hi, e_lo, s, arrs):
    """r = s - A (e_hi + e_lo) and ||r||, evaluated in double-single.

    ``e_hi``/``e_lo``: split-accumulated field components; ``s``: source
    tuple; ``arrs``: level-0 array dict including the df64 coefficient
    lo-parts ('eta_x_lo', ..., 'zeta_lo', 'ihx', 'ihx_lo', ...) built by
    solver._build_hierarchy.  Returns (r_tuple, l2) with r rounded back
    to working precision.

    Correctness under jit is NOT automatic: XLA:CPU's fusion emitters
    produce value-unsafe fused loops that demote this function's
    result to ~f32 accuracy (see :func:`jit_exact`, which every
    executable containing this function must be built with).  The
    ``lax.optimization_barrier`` on the entry pairs and on the final
    (hi, lo)->working-dtype collapse is defense-in-depth for backends
    that honor barriers (XLA:CPU strips them before fusion; TPU keeps
    them): it pins the EFT-critical pairs as fusion roots at the cost
    of a few elementwise materializations.
    """
    from jax import lax

    e_hi = lax.optimization_barrier(tuple(e_hi))
    e_lo = lax.optimization_barrier(tuple(e_lo))
    hx = arrs["hx"]
    nx, ny, nz = hx.size, arrs["hy"].size, arrs["hz"].size
    is_complex = jnp.iscomplexobj(e_hi[0])

    def ihp(name, sel):
        return (arrs[name][sel], arrs[name + "_lo"][sel])

    ihx = ihp("ihx", (slice(None), None, None))
    ihy = ihp("ihy", (None, slice(None), None))
    ihz = ihp("ihz", (None, None, slice(None)))

    zeta = (arrs["zeta"], arrs["zeta_lo"])
    zx = _pair_clamped_df(zeta, 0)
    zy = _pair_clamped_df(zeta, 1)
    zz = _pair_clamped_df(zeta, 2)

    def st_df(eta_pair, ax0, ax1):
        """df64 of the 4-cell sum along ax0 then ax1 of a df real array."""
        s1 = _sum_pairs_clamped_df(eta_pair, ax0)
        return _df_add(s1, _shift_down_clamped_df(s1, ax1))

    def eta_parts(name):
        hi, lo = arrs[name], arrs[name + "_lo"]
        re = (jnp.real(hi), jnp.real(lo))
        im = (jnp.imag(hi), jnp.imag(lo)) if is_complex else None
        return re, im

    def comp_parts(hi, lo):
        re = _two_sum(jnp.real(hi), jnp.real(lo))
        im = _two_sum(jnp.imag(hi), jnp.imag(lo)) if is_complex else None
        return re, im

    exr, exi = comp_parts(e_hi[0], e_lo[0])
    eyr, eyi = comp_parts(e_hi[1], e_lo[1])
    ezr, ezi = comp_parts(e_hi[2], e_lo[2])

    ccr = _curlcurl_df(exr, eyr, ezr, zx, zy, zz, ihx, ihy, ihz, nx, ny, nz)
    if is_complex:
        cci = _curlcurl_df(exi, eyi, ezi, zx, zy, zz, ihx, ihy, ihz,
                           nx, ny, nz)

    ex_re, ex_im = eta_parts("eta_x")
    ey_re, ey_im = eta_parts("eta_y")
    ez_re, ez_im = eta_parts("eta_z")
    stx_r = st_df(ex_re, 1, 2)
    sty_r = st_df(ey_re, 0, 2)
    stz_r = st_df(ez_re, 0, 1)
    if is_complex:
        stx_i = st_df(ex_im, 1, 2)
        sty_i = st_df(ey_im, 0, 2)
        stz_i = st_df(ez_im, 0, 1)

    def assemble(cc_r, cc_i, st_r, st_i, er, ei, blk, s_comp):
        """a = 0.5 cc - 0.25 st*e on the block; r = s - a."""
        er_b = _sl(er, blk)
        if is_complex:
            ei_b = _sl(ei, blk)
            sig_r = _df_sub(_df_mul(st_r, er_b), _df_mul(st_i, ei_b))
            sig_i = _df_add(_df_mul(st_r, ei_b), _df_mul(st_i, er_b))
        else:
            sig_r = _df_mul(st_r, er_b)

        a_r = _df_sub(_df_scale(cc_r, 0.5), _df_scale(sig_r, 0.25))
        r_r = _df_sub(_df(jnp.real(s_comp[blk])), a_r)
        r_r = lax.optimization_barrier(r_r)
        r_blk = r_r[0] + r_r[1]
        if is_complex:
            a_i = _df_sub(_df_scale(cc_i, 0.5), _df_scale(sig_i, 0.25))
            r_i = _df_sub(_df(jnp.imag(s_comp[blk])), a_i)
            r_i = lax.optimization_barrier(r_i)
            r_blk = r_blk + 1j * (r_i[0] + r_i[1])
        # Far planes: zero operator rows -> r = s there.
        return s_comp.astype(r_blk.dtype).at[blk].set(r_blk)

    blk_x = (slice(None), slice(0, ny), slice(0, nz))
    blk_y = (slice(0, nx), slice(None), slice(0, nz))
    blk_z = (slice(0, nx), slice(0, ny), slice(None))

    rx = assemble(ccr[0], cci[0] if is_complex else None, stx_r,
                  stx_i if is_complex else None, exr, exi, blk_x, s[0])
    ry = assemble(ccr[1], cci[1] if is_complex else None, sty_r,
                  sty_i if is_complex else None, eyr, eyi, blk_y, s[1])
    rz = assemble(ccr[2], cci[2] if is_complex else None, stz_r,
                  stz_i if is_complex else None, ezr, ezi, blk_z, s[2])

    l2 = jnp.sqrt(jnp.sum(jnp.abs(rx) ** 2) + jnp.sum(jnp.abs(ry) ** 2)
                  + jnp.sum(jnp.abs(rz) ** 2))
    return (rx, ry, rz), l2
