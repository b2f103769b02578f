"""Multigrid solver for 3-D electromagnetic diffusion (TPU-native).

Rebuild of the reference's emg3d/solver.py on JAX/XLA:

- One complete multigrid cycle (all levels: smoothing, residual,
  restriction, recursion, prolongation) is traced into a SINGLE jitted
  function per (grid-hierarchy, semicoarsening, linerelaxation, cycle)
  configuration: the recursion of the reference (solver.py:471-649)
  unrolls at trace time because grid shapes per level are static.
- The outer iteration (termination on tolerance / divergence / stagnation,
  reference solver.py:1591-1664) is host-driven: one device sync per
  cycle for the residual norm; cycle functions are cached and reused.
- The MG-preconditioned Krylov solvers (reference solver.py:652-784)
  are all native with device-side linear algebra: BiCGSTAB, CGS, and
  recycled-subspace GCROT(m,k) — no scipy in the solve path.

The smoothers use red-black orderings (see emg3d_tpu.ops.smoothers);
convergence parity with the reference is therefore measured in
cycles-to-tolerance, not bitwise field equality.
"""

import contextvars
import functools
import itertools
import os
from dataclasses import dataclass
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np
import scipy as sp

from emg3d_tpu import backend, config, fields, meshes, models, utils
from emg3d_tpu.ops import df64, operator, smoothers, transfer

__all__ = ['solve', 'solve_source', 'multigrid', 'krylov', 'smoothing',
           'restriction', 'prolongation', 'residual', 'MGParameters',
           'RegularGridProlongator']


def __dir__():
    return __all__


# ==========================================================================
# Public entry points.
# ==========================================================================

def solve(model, sfield, sslsolver=True, semicoarsening=True,
          linerelaxation=True, verb=0, **kwargs):
    """Solve the 3-D electromagnetic diffusion equation.

    Same signature and semantics as the reference solve()
    (emg3d/solver.py:52-449): MG-preconditioned BiCGSTAB with
    semicoarsening and line relaxation by default; ``plain=True`` for
    stand-alone multigrid F-cycles.

    Returns the electric field (and an info dict if ``return_info``).
    """
    always_return = kwargs.pop('always_return', False)

    if kwargs.pop('plain', False):
        sslsolver = False if sslsolver is True else sslsolver
        semicoarsening = False if semicoarsening is True else semicoarsening
        linerelaxation = False if linerelaxation is True else linerelaxation
    efield = kwargs.pop('efield', None)

    # Domain decomposition: a jax.sharding.Mesh (or a GridPlacement)
    # shards the grid over devices; see emg3d_tpu.parallel.domain.
    mesh = kwargs.pop('mesh', None)

    var = MGParameters(
        sslsolver=sslsolver, semicoarsening=semicoarsening,
        linerelaxation=linerelaxation, shape_cells=model.shape, verb=verb,
        **kwargs)

    if mesh is not None:
        from emg3d_tpu.parallel.domain import GridPlacement
        var.placement = (mesh if isinstance(mesh, GridPlacement)
                         else GridPlacement(mesh))

    var.cprint(f"\n:: emg3d-tpu START :: {var.time.now} ::\n", 2)
    var.cprint(var, 2)

    # Reference error (norm of b).
    var.l2_refe = float(sp.linalg.norm(sfield.field, check_finite=False))
    var.error_at_cycle[0] = var.l2_refe

    if sfield.frequency is None:
        raise ValueError(
            "Source field is missing frequency information; create it "
            "with `emg3d_tpu.fields.get_source_field`.")

    vmodel = models.VolumeModel(model, sfield)

    info = ''
    if efield is None:
        efield = fields.Field(model.grid, dtype=sfield.field.dtype,
                              frequency=sfield._frequency)
        var.do_return = True
    else:
        if sfield.field.dtype != efield.field.dtype:
            raise ValueError(
                "Source field and electric field must have the same dtype; "
                f"sfield: {sfield.field.dtype}; efield: "
                f"{efield.field.dtype}.")
        if efield._frequency is None:
            efield._frequency = sfield._frequency

        # Enforce PEC on the provided initial field.
        efield.fx[:, 0, :] = efield.fx[:, -1, :] = 0.
        efield.fx[:, :, 0] = efield.fx[:, :, -1] = 0.
        efield.fy[0, :, :] = efield.fy[-1, :, :] = 0.
        efield.fy[:, :, 0] = efield.fy[:, :, -1] = 0.
        efield.fz[0, :, :] = efield.fz[-1, :, :] = 0.
        efield.fz[:, 0, :] = efield.fz[:, -1, :] = 0.

        var.do_return = always_return

        # Already good enough?
        var.l2 = residual(vmodel, sfield, efield, True)
        if var.l2 < var.tol * var.l2_refe:
            var.sslsolver = None
            var.cycle = None
            var.exit_message = "CONVERGED"
            info = "   > NOTHING DONE (provided efield already good enough)\n"

    # Zero source -> zero field.
    if var.l2_refe < 100 * np.finfo(np.float64).tiny:
        var.l2_refe = np.nan
        var.sslsolver = None
        var.cycle = None
        var.exit_message = "CONVERGED"
        info = "   > RETURN ZERO E-FIELD (provided sfield is zero)\n"
        efield = fields.Field(model.grid, dtype=sfield.field.dtype,
                              frequency=sfield._frequency)

    if var.sslsolver:
        krylov(vmodel, sfield, efield, var)
    elif var.cycle:
        multigrid(vmodel, sfield, efield, var)

    exit_status = int(var.exit_message != 'CONVERGED')

    if var.verb > 2:
        if var.sslsolver:
            info = f"   > Solver steps     : {var.ssl_it}\n"
            if var.cycle:
                info += f"   > MG prec. steps   : {var.it}\n"
        elif var.cycle:
            info = f"   > MG cycles        : {var.it}\n"
        info += f"   > Final rel. error : {var.l2/var.l2_refe:.3e}\n\n"
        info += f":: emg3d-tpu END :: {var.time.now} :: "
        info += f"runtime = {var.time.runtime}\n"
        var.cprint(info, 2)
    elif var.verb == 0 and exit_status == 1:
        var.cprint(f"* WARNING :: {var.exit_message}", -1)

    if var.return_info:
        info_dict = {
            'exit': exit_status,
            'exit_message': var.exit_message,
            'abs_error': var.l2,
            'rel_error': var.l2 / var.l2_refe,
            'ref_error': var.l2_refe,
            'tol': var.tol,
            'it_mg': var.it,
            'it_ssl': var.ssl_it,
            'time': var.runtime_at_cycle[-1],
            'runtime_at_cycle': var.runtime_at_cycle,
            'error_at_cycle': var.error_at_cycle,
            'log': var.log_message,
        }

    if var.do_return and var.return_info:
        return efield, info_dict
    elif var.do_return:
        return efield
    elif var.return_info:
        return info_dict


def solve_source(model, source, frequency, **kwargs):
    """Shortcut: build the source field, then solve (solver.py:452-467)."""
    sfield = fields.get_source_field(model.grid, source, frequency)
    return solve(model, sfield, **kwargs)


# ==========================================================================
# Device-side helpers.
# ==========================================================================

def _field_to_dev(field):
    """Field -> tuple of device arrays (working precision)."""
    dt = (config.complex_dtype()
          if np.iscomplexobj(field.field) else config.float_dtype())
    return (jnp.asarray(np.ascontiguousarray(field.fx), dtype=dt),
            jnp.asarray(np.ascontiguousarray(field.fy), dtype=dt),
            jnp.asarray(np.ascontiguousarray(field.fz), dtype=dt))


def _dev_to_field(e, grid, frequency, dtype):
    """Tuple of device arrays -> Field (host)."""
    out = fields.Field(grid, dtype=dtype, frequency=frequency)
    out.fx = np.asarray(e[0], dtype=dtype)
    out.fy = np.asarray(e[1], dtype=dtype)
    out.fz = np.asarray(e[2], dtype=dtype)
    return out


def _vmodel_to_dev(vmodel):
    """VolumeModel -> dict of device arrays in working precision."""
    cdt = (config.complex_dtype()
           if np.iscomplexobj(vmodel.eta_x) else config.float_dtype())
    fdt = config.float_dtype()
    return {
        'eta_x': jnp.asarray(vmodel.eta_x, dtype=cdt),
        'eta_y': jnp.asarray(vmodel.eta_y, dtype=cdt),
        'eta_z': jnp.asarray(vmodel.eta_z, dtype=cdt),
        'zeta': jnp.asarray(vmodel.zeta, dtype=fdt),
        'hx': jnp.asarray(vmodel.grid.h[0], dtype=fdt),
        'hy': jnp.asarray(vmodel.grid.h[1], dtype=fdt),
        'hz': jnp.asarray(vmodel.grid.h[2], dtype=fdt),
    }


# ==========================================================================
# Hierarchy construction (host-side, per semicoarsening direction).
# ==========================================================================

def _current_sc_dir(sc_dir, shape):
    """Effective semicoarsening direction for this grid's shape.

    Mirrors reference solver.py:1482-1531.
    """
    xsc = shape[0] % 2 != 0 or shape[0] < 3 or sc_dir == 1
    ysc = shape[1] % 2 != 0 or shape[1] < 3 or sc_dir == 2
    zsc = shape[2] % 2 != 0 or shape[2] < 3 or sc_dir == 3

    if xsc:
        if ysc:
            return 6
        elif zsc:
            return 5
        else:
            return 1
    elif ysc:
        if zsc:
            return 4
        else:
            return 2
    elif zsc:
        return 3
    return 0


def _current_lr_dir(lr_dir, shape):
    """Effective line-relaxation direction (reference solver.py:1534-1588)."""
    c = int(lr_dir)
    if shape[0] == 2:
        c = {1: 0, 5: 3, 6: 2, 7: 4}.get(c, c)
    if shape[1] == 2:
        c = {2: 0, 4: 3, 6: 1, 7: 5}.get(c, c)
    if shape[2] == 2:
        c = {3: 0, 4: 2, 5: 1, 7: 6}.get(c, c)
    return c


def _coarsen_flags(c_sc_dir):
    """(bool, bool, bool): which axes get coarsened (solver.py:891-897)."""
    return (c_sc_dir not in [1, 5, 6],
            c_sc_dir not in [2, 4, 6],
            c_sc_dir not in [3, 4, 5])


def _build_hierarchy(vmodel, sc_dir, lr_dir, clevel_max, placement=None):
    """Build per-level model/grid/transfer data for one sc_dir.

    Everything static (shapes, flags) goes into ``meta`` (hashable tuple);
    device arrays go into ``arrays`` (a pytree passed into the jitted
    cycle function).  Model restriction is the 2/4/8-cell sum of the
    reference (solver.py:1667-1718); weights per Muld06 Eq. 9.

    ``placement`` (a parallel.domain.GridPlacement) shards each level's
    arrays over a device mesh — fine levels grid-sharded, coarse levels
    replicated; XLA inserts the halo exchanges in the level ops.
    """
    fdt = config.float_dtype()
    cdt = (config.complex_dtype()
           if np.iscomplexobj(vmodel.eta_x) else fdt)

    # Big-grid CPU solves: keep XLA's op-output buffers on the glibc
    # heap instead of per-allocation mmaps (see backend.tune_host_malloc
    # for the measured 60x alloc-churn penalty above ~32 MB buffers).
    if (int(np.prod(vmodel.grid.shape_cells)) * np.dtype(cdt).itemsize
            > 32 * 2 ** 20 and jax.default_backend() == "cpu"):
        backend.tune_host_malloc()

    # Host-side numpy copies of the finest level.
    eta_x = np.asarray(vmodel.eta_x)
    eta_y = np.asarray(vmodel.eta_y)
    eta_z = np.asarray(vmodel.eta_z)
    zeta = np.asarray(vmodel.zeta)
    h = [np.asarray(vmodel.grid.h[i]) for i in range(3)]
    origin = np.asarray(vmodel.grid.origin)

    meta = []
    arrays = []

    level = 0
    while True:
        grid = meshes.BaseMesh(h, origin)
        shape = grid.shape_cells
        lvl_arrays = {
            'eta_x': jnp.asarray(eta_x, dtype=cdt),
            'eta_y': jnp.asarray(eta_y, dtype=cdt),
            'eta_z': jnp.asarray(eta_z, dtype=cdt),
            'zeta': jnp.asarray(zeta, dtype=fdt),
            'hx': jnp.asarray(h[0], dtype=fdt),
            'hy': jnp.asarray(h[1], dtype=fdt),
            'hz': jnp.asarray(h[2], dtype=fdt),
        }
        if level == 0 and np.dtype(fdt) == np.float32:
            # df64 coefficient lo-parts for the double-single residual
            # evaluation (ops.df64): the float64 host values split into
            # (hi, lo) float32 pairs; the system solved is then the f64
            # discretization, not its f32 rounding.
            for name, val in (('eta_x', eta_x), ('eta_y', eta_y),
                              ('eta_z', eta_z), ('zeta', zeta)):
                hi, lo = df64.split_f64(np.asarray(val, dtype=np.complex128
                                        if np.iscomplexobj(val)
                                        else np.float64), fdt)
                lvl_arrays[name + '_lo'] = jnp.asarray(lo)
            for name, hh in (('ihx', h[0]), ('ihy', h[1]), ('ihz', h[2])):
                hi, lo = df64.split_f64(1.0 / np.asarray(hh,
                                                         dtype=np.float64),
                                        fdt)
                lvl_arrays[name] = jnp.asarray(hi)
                lvl_arrays[name + '_lo'] = jnp.asarray(lo)
        if placement is None and smoothers.resolve_impl() == 'blocked':
            # Pre-blocked smoother operands (once per level, reused by
            # every smoothing call on this hierarchy): the blocked
            # smoothing path then only de-interleaves the fields and
            # the level source per call (ops/blocked.py).
            from emg3d_tpu.ops import blocked
            lvl_arrays['blk'] = blocked.block_model_operands(
                lvl_arrays['eta_x'], lvl_arrays['eta_y'],
                lvl_arrays['eta_z'], lvl_arrays['zeta'])
            if lr_dir != 0:
                # Line relaxation runs the y-/z-phases in permuted
                # frames: pre-transpose the invariant model operands
                # once per level (fields still transpose per call).
                lvl_arrays['blk_t'] = blocked.transposed_model_frames(
                    lvl_arrays['blk'])
        lvl_meta = {
            'shape': tuple(shape),
            'c_lr_dir': _current_lr_dir(lr_dir, shape),
            'coarsen': None,
        }

        if level == clevel_max:
            meta.append(lvl_meta)
            if placement is not None:
                lvl_arrays = placement.place_level(lvl_arrays, shape)
            arrays.append(lvl_arrays)
            break

        # Coarsen for the next level.
        c_sc = _current_sc_dir(sc_dir, shape)
        coarsen = _coarsen_flags(c_sc)
        lvl_meta['coarsen'] = coarsen

        ch = [np.diff(np.r_[0., h[i].cumsum()][::2]) if coarsen[i] else h[i]
              for i in range(3)]
        cgrid = meshes.BaseMesh(ch, origin)

        # Restriction weights per axis (dummy identity on non-coarsened).
        rw = []
        pm = []
        for i, coord in enumerate('xyz'):
            if coarsen[i]:
                nodes = getattr(grid, 'nodes_' + coord)
                ccs = getattr(grid, 'cell_centers_' + coord)
                cnodes = getattr(cgrid, 'nodes_' + coord)
                cccs = getattr(cgrid, 'cell_centers_' + coord)
                wl, w0, wr = transfer.restrict_weights(
                    nodes, ccs, h[i], cnodes, cccs, ch[i])
                rw.append((jnp.asarray(wl, dtype=fdt),
                           jnp.asarray(w0, dtype=fdt),
                           jnp.asarray(wr, dtype=fdt)))
                idx, w = transfer.prolong_meta(cnodes, nodes)
                pm.append((jnp.asarray(idx), jnp.asarray(w, dtype=fdt)))
            else:
                rw.append(None)
                pm.append(None)
        lvl_arrays['rw'] = tuple(rw)
        lvl_arrays['pm'] = tuple(pm)

        meta.append(lvl_meta)
        if placement is not None:
            lvl_arrays = placement.place_level(lvl_arrays, shape)
        arrays.append(lvl_arrays)

        # Restrict model parameters (host numpy).
        eta_x = np.asarray(
            transfer.restrict_model_parameters(eta_x, coarsen))
        eta_y = np.asarray(
            transfer.restrict_model_parameters(eta_y, coarsen))
        eta_z = np.asarray(
            transfer.restrict_model_parameters(eta_z, coarsen))
        zeta = np.asarray(
            transfer.restrict_model_parameters(zeta, coarsen))
        h = ch
        level += 1

    return tuple((m['shape'], m['c_lr_dir'], m['coarsen'])
                 for m in meta), arrays


# ==========================================================================
# Per-level jitted operations (host-driven multigrid cycle).
#
# One big jitted full-cycle function would unroll hundreds of smoothing
# phases into a single XLA graph (minutes of compile time); instead each
# level-op is its own jitted function — jax's jit cache retraces per
# (shape, static-arg) combination, so every level compiles once and is
# reused across cycles.  The host only orchestrates (all data stays on
# device); dispatch overhead is negligible vs the kernel times.
# ==========================================================================

def _smooth_dev(e, s, arrs, c_lr_dir, nu):
    """Smoothing dispatch (reference solver.py:788-846).

    When the hierarchy carries pre-blocked model operands ('blk',
    added by _build_hierarchy for unsharded solves under
    EMG3D_TPU_SMOOTHER=blocked/auto-on-CPU), the WHOLE smoothing call
    — point sweeps and every line-relaxation axis — runs on the
    parity-blocked layout: fields de-interleaved once per call, model
    operands never re-blocked (ops/blocked.py).
    """
    if 'blk' in arrs and smoothers.resolve_impl() == 'blocked':
        from emg3d_tpu.ops import blocked
        return blocked.smooth_blocked_dev(
            e, s, arrs['blk'], arrs['hx'], arrs['hy'], arrs['hz'],
            c_lr_dir, nu, ops_t=arrs.get('blk_t'))
    P = (arrs['eta_x'], arrs['eta_y'], arrs['eta_z'], arrs['zeta'],
         arrs['hx'], arrs['hy'], arrs['hz'])
    if c_lr_dir == 0:
        e = smoothers.gauss_seidel(*e, *s, *P, nu)
    if c_lr_dir in [1, 5, 6, 7]:
        e = smoothers.gauss_seidel_line(*e, *s, *P, nu, 0)
    if c_lr_dir in [2, 4, 6, 7]:
        e = smoothers.gauss_seidel_line(*e, *s, *P, nu, 1)
    if c_lr_dir in [3, 4, 5, 7]:
        e = smoothers.gauss_seidel_line(*e, *s, *P, nu, 2)
    return e


def _gs_phase_fn(e, s, arrs, color):
    P = (arrs['eta_x'], arrs['eta_y'], arrs['eta_z'], arrs['zeta'],
         arrs['hx'], arrs['hy'], arrs['hz'])
    return smoothers.gauss_seidel_phase(*e, *s, *P, *color)


_gs_phase_jit = jax.jit(_gs_phase_fn, static_argnames=('color',))
_gs_phase_jit_don = jax.jit(_gs_phase_fn, static_argnames=('color',),
                            donate_argnums=(0,))


def _line_phase_fn(e, s, arrs, color, axis):
    P = (arrs['eta_x'], arrs['eta_y'], arrs['eta_z'], arrs['zeta'],
         arrs['hx'], arrs['hy'], arrs['hz'])
    return smoothers.gauss_seidel_line_phase(*e, *s, *P, *color, axis)


_line_phase_jit = jax.jit(_line_phase_fn, static_argnames=('color', 'axis'))
_line_phase_jit_don = jax.jit(_line_phase_fn,
                              static_argnames=('color', 'axis'),
                              donate_argnums=(0,))


def _donate_on():
    """Whether host-driven level ops donate their field buffers.

    XLA:CPU allocates each executable's output buffers afresh with a
    direct mmap (bypassing malloc), so above ~32 MB per buffer every
    level-op dispatch pays page faults + kernel zero-fill — measured
    5.8x on a 135 MB elementwise op, and the mechanism behind the
    >=192^3 plain-cycle cells/s collapse (59k at 128^3 -> 18k at
    256^3).  Donating the iterate lets XLA write in place.

    Default 'auto' enables donation only on the CPU backend: the
    tunneled-TPU path re-runs failed device steps from their captured
    input buffers (backend.retry_transient), which donation would have
    consumed.  EMG3D_TPU_DONATE = auto | 1 | 0, read per host dispatch.
    """
    mode = os.environ.get('EMG3D_TPU_DONATE', 'auto')
    if mode == 'auto':
        return jax.default_backend() == 'cpu'
    return mode == '1'


def _residual_dev(e, s, arrs):
    return operator.residual(
        *s, *e, arrs['eta_x'], arrs['eta_y'], arrs['eta_z'], arrs['zeta'],
        arrs['hx'], arrs['hy'], arrs['hz'])


# Synchronous-dispatch mode for grid-sharded solves on the CPU backend:
# the virtual multi-device mesh timeshares ONE host, and XLA's
# collective rendezvous aborts the process (rendezvous.cc, 40 s
# timeout) if some participant threads are starved — e.g. while the
# main thread compiles the next phase executable.  Blocking after every
# dispatch guarantees each executable's collectives complete before
# anything else competes for the core.  Real TPU meshes (one runtime
# per chip) don't need this and keep fully async dispatch.
#
# Scoped per solve via a ContextVar (set by multigrid()/krylov() from
# the solve's placement, reset on exit): concurrent solves in other
# threads/tasks each see their own value, and nothing leaks across
# solves.
_SYNC_DISPATCH = contextvars.ContextVar('emg3d_sync_dispatch',
                                        default=False)


def _sync_dispatch_for(var):
    """Sync-dispatch setting for this solve (see _SYNC_DISPATCH)."""
    return (var.placement is not None
            and jax.default_backend() == 'cpu')


def _sj(x):
    if _SYNC_DISPATCH.get():
        jax.block_until_ready(x)
    return x


def _with_sync_dispatch(fn):
    """Scope _SYNC_DISPATCH to one solver-driver invocation."""
    @functools.wraps(fn)
    def wrapper(model, sfield, efield, var, **kwargs):
        token = _SYNC_DISPATCH.set(_sync_dispatch_for(var))
        try:
            return fn(model, sfield, efield, var, **kwargs)
        finally:
            _SYNC_DISPATCH.reset(token)
    return wrapper


def _smooth_phases(e, s, arrs, c_lr_dir, nu):
    """Smoothing via per-PHASE jitted kernels.

    One executable per (shape, smoother-kind, color) — reused for every
    nu, every smoothing position (pre/post/init/coarse) and BOTH sweep
    orders (a reverse sweep is the same phases in the opposite order) —
    keeps the number and the size of the compiled XLA graphs small
    (compile time is superlinear in graph size, and per-phase graphs
    are ~1/8 of a sweep).
    """
    shape = (arrs['hx'].size, arrs['hy'].size, arrs['hz'].size)
    gs_p = _gs_phase_jit_don if _donate_on() else _gs_phase_jit
    ln_p = _line_phase_jit_don if _donate_on() else _line_phase_jit
    # Each kernel completes its nu sweeps before the next one runs
    # (reference solver.py:836-846).
    if c_lr_dir == 0:
        for sweep in range(nu):
            for c in smoothers.phase_colors(shape, sweep % 2 == 1):
                e = _sj(gs_p(e, s, arrs, c))
    for axis, dirs in ((0, (1, 5, 6, 7)), (1, (2, 4, 6, 7)),
                       (2, (3, 4, 5, 7))):
        if c_lr_dir in dirs:
            for sweep in range(nu):
                for c in smoothers.line_phase_colors(
                        shape, axis, sweep % 2 == 1):
                    e = _sj(ln_p(e, s, arrs, c, axis))
    return e


def _smooth_sweep_fn(e, s, arrs, c_lr_dir, nu):
    """Whole-smooth executable: all phases of all nu sweeps fused.

    One executable per (shape, smoother-kind, nu): ~16x fewer
    dispatches than the per-phase path and XLA can overlap/fuse across
    phase boundaries — the faster warm path.  Compile time is larger
    (the graph holds 8*nu phase bodies), so the per-phase path remains
    the cold-friendly option (EMG3D_TPU_SMOOTH_DISPATCH=phase).
    """
    return _smooth_dev(e, s, arrs, c_lr_dir, nu)


_smooth_sweep_jit = jax.jit(_smooth_sweep_fn,
                            static_argnames=('c_lr_dir', 'nu'))
_smooth_sweep_jit_don = jax.jit(_smooth_sweep_fn,
                                static_argnames=('c_lr_dir', 'nu'),
                                donate_argnums=(0,))


def _smooth_dispatch():
    # 'sweep' (default): whole-smooth executables — fastest warm,
    # slower cold; 'phase': per-phase executables — fastest cold.
    # Read per host dispatch (cheap dict lookup), so the knob really
    # can be flipped between solves without re-importing.
    return os.environ.get('EMG3D_TPU_SMOOTH_DISPATCH', 'sweep')


def _smooth_jit(e, s, arrs, c_lr_dir, nu):
    if _smooth_dispatch() == 'phase':
        return _smooth_phases(e, s, arrs, c_lr_dir, nu)
    sweep = _smooth_sweep_jit_don if _donate_on() else _smooth_sweep_jit
    return _sj(sweep(e, s, arrs, c_lr_dir, nu))


@df64.jit_exact
def _residual_norm_split_core_jit(e_hi, e_lo, s, arrs):
    """Residual r = s - A (e_hi + e_lo) and its norm, for a split field.

    The solution is accumulated as an unevaluated sum e_hi + e_lo (see
    :func:`_accumulate_jit`).  In float32 working precision the residual
    is evaluated in double-single arithmetic (ops.df64) — a plain f32
    evaluation floors the solve at ~4e-6 relative residual; in float64
    mode A's linearity is used to avoid forming the sum.  Compiled via
    :func:`df64.jit_exact`: XLA:CPU's default fusion emitters are
    value-unsafe and silently demote the df64 evaluation to ~f32.
    """
    if e_hi[0].dtype in (jnp.complex64, jnp.float32):
        return df64.residual_norm_split_df64(e_hi, e_lo, s, arrs)

    a_hi = _residual_dev(e_hi, s, arrs)          # s - A e_hi
    a_lo = operator.amat_x(
        *e_lo, arrs['eta_x'], arrs['eta_y'], arrs['eta_z'], arrs['zeta'],
        arrs['hx'], arrs['hy'], arrs['hz'])      # A e_lo
    r = tuple(h - l for h, l in zip(a_hi, a_lo))
    return r, operator.residual_norm(*r)


def _f64_coeffs(arrs):
    """Reconstruct the float64 level-0 coefficients from their split
    (hi, lo) pairs — exact: the pairs were produced by splitting the
    f64 host values (``_build_hierarchy``)."""
    def up(x):
        return x.astype(jnp.complex128 if jnp.iscomplexobj(x)
                        else jnp.float64)

    eta = [up(arrs[k]) + up(arrs[k + '_lo'])
           for k in ('eta_x', 'eta_y', 'eta_z')]
    zeta = up(arrs['zeta']) + up(arrs['zeta_lo'])
    # amat_x forms 1/h itself: hand it widths whose f64 inverses are
    # the split ih pairs (double rounding ~eps64, negligible).
    hs = [1.0 / (up(arrs['ih' + ax]) + up(arrs['ih' + ax + '_lo']))
          for ax in 'xyz']
    return eta, zeta, hs


@jax.jit
def _residual_norm_split_f64_jit(e_hi, e_lo, s, arrs):
    """CPU fast-exact split residual: evaluate in native complex128.

    On CPU, float64 is native and fast; promoting the split operands
    and evaluating r = s - A e in complex128 is both cheaper and more
    accurate (~eps64) than the double-single path with the legacy
    (value-exact) emitters — measured 32c: 0.05 s vs 0.32 s.  Traced
    under ``jax.experimental.enable_x64`` by the dispatcher below.
    """
    cdt = e_hi[0].dtype

    def up(x):
        return x.astype(jnp.complex128 if jnp.iscomplexobj(x)
                        else jnp.float64)

    e = tuple(up(h) + up(l) for h, l in zip(e_hi, e_lo))
    eta, zeta, hs = _f64_coeffs(arrs)
    ae = operator.amat_x(*e, *eta, zeta, *hs)
    r = tuple(up(c) - a for c, a in zip(s, ae))
    l2 = operator.residual_norm(*r)
    return (tuple(c.astype(cdt) for c in r),
            l2.astype(jnp.float32))


def _residual_norm_split_jit(e_hi, e_lo, s, arrs):
    """Platform-adaptive split residual dispatch (host level).

    f32 working precision on the CPU backend takes the native-f64
    evaluation (fast and exact there); everything else (f64 tests,
    TPU production) takes the core executable.
    """
    if (e_hi[0].dtype in (jnp.complex64, jnp.float32)
            and jax.default_backend() == 'cpu'):
        with jax.enable_x64(True):
            return _residual_norm_split_f64_jit(e_hi, e_lo, s, arrs)
    return _residual_norm_split_core_jit(e_hi, e_lo, s, arrs)


def _accumulate_fn(e_hi, e_lo, de):
    """(e_hi, e_lo) += de with an error-free fast-two-sum per element.

    Keeps the multigrid corrections from rounding away once they are
    ~eps-relative to the field — the mechanism that otherwise floors a
    float32 solve at ~1e-5 relative residual.  In float64 mode the same
    code simply extends the effective accumulation precision.
    Compiled via :func:`df64.jit_exact` (EFT arithmetic; see there).
    """
    def f2s(hi, lo, d):
        t = lo + d
        hi2 = hi + t
        lo2 = t - (hi2 - hi)
        return hi2, lo2

    out = [f2s(h, l, d) for h, l, d in zip(e_hi, e_lo, de)]
    return tuple(o[0] for o in out), tuple(o[1] for o in out)


_accumulate_jit = df64.jit_exact(_accumulate_fn)
# Donate the iterate pair only: the six outputs alias the six (e_hi,
# e_lo) buffers exactly; adding de would leave unusable donations
# (XLA warns per compile).
_accumulate_jit_don = df64.jit_exact(_accumulate_fn,
                                     donate_argnums=(0, 1))


def _accumulate_call(e_hi, e_lo, de):
    """Host-dispatch accumulate; donates all three fields when enabled.

    Only for call sites where e_hi/e_lo/de are dead afterwards and
    refer to three DISTINCT buffers (donating one buffer twice is an
    error) — the solver drivers' threaded iterates qualify.
    """
    if _donate_on():
        return _accumulate_jit_don(e_hi, e_lo, de)
    return _accumulate_jit(e_hi, e_lo, de)


@functools.partial(jax.jit, static_argnames=('coarsen',))
def _restrict_jit(e, s, arrs, coarsen):
    """Fused residual + restriction -> (coarse source, zero guess).

    The zero coarse-level guess is produced here (same executable) so
    the cycle driver never dispatches eager zero-fills between kernels.
    """
    res = _residual_dev(e, s, arrs)
    cs = transfer.restrict(*res, arrs['rw'], coarsen)
    return cs, tuple(jnp.zeros_like(c) for c in cs)


def _prolong_fn(e, ce, arrs, coarsen):
    return transfer.prolong(*e, *ce, arrs['pm'], coarsen)


_prolong_jit = jax.jit(_prolong_fn, static_argnames=('coarsen',))
_prolong_jit_don = jax.jit(_prolong_fn, static_argnames=('coarsen',),
                           donate_argnums=(0,))


@jax.jit
def _resnorm_jit(e, s, arrs):
    return operator.residual_norm(*_residual_dev(e, s, arrs))


def _cycle_correction(meta, arrays, r, var, first, smooth=_smooth_jit,
                      restrict=_restrict_jit, prolong=None):
    """One multigrid cycle applied to residual ``r`` from a zero guess.

    The multigrid cycle is a *linear* stationary iteration, so running it
    on (A, r) from zero and adding the result to the iterate is
    algebraically identical to the reference's in-place form
    (solver.py:471-649) — but it lets the caller accumulate the
    correction in split precision (see :func:`_accumulate_jit`).
    Includes the F-cycle's decreasing-cycmax mechanics (reference
    solver.py:519-526) and the coarsest-grid Gauss-Seidel direct-ish
    solve (solver.py:566-578).  Returns the correction ``de``.
    """
    nlevels = len(meta)
    cycle = var.cycle
    cycmax0 = var.cycmax
    if prolong is None:
        # Host-driven path: donate the fine iterate into the prolong
        # executable when enabled.  The whole-cycle factories pass the
        # undonated _prolong_jit explicitly (donation inside a trace
        # is meaningless — XLA plans the fused program's buffers).
        prolong = _prolong_jit_don if _donate_on() else _prolong_jit

    def track_smooth(e, s, arrs, c_lr_dir, nu, level):
        # The level trace feeds the verb>3 cycle-QC visualization
        # (reference appends per smoothing call, solver.py:840-846).
        var.level_all.append(level)
        return smooth(e, s, arrs, c_lr_dir, nu)

    def recurse(s, e, level, new_cycmax):
        shape, c_lr_dir, coarsen = meta[level]
        arrs = arrays[level]

        if level == nlevels - 1:
            cycmax = 1
        elif new_cycmax == 0 or cycle != 'F':
            cycmax = cycmax0
        else:
            cycmax = new_cycmax

        it = 0
        cyc = 0
        while it < cycmax:
            if level == nlevels - 1:
                # Coarsest grid: Gauss-Seidel as direct-ish solver.
                e = track_smooth(e, s, arrs, c_lr_dir, var.nu_coarse,
                                 level)
            else:
                if var.nu_pre > 0:
                    e = track_smooth(e, s, arrs, c_lr_dir, var.nu_pre,
                                     level)

                cs, ce = _sj(restrict(e, s, arrs, coarsen))
                ce = recurse(cs, ce, level + 1, cycmax - cyc)
                e = _sj(prolong(e, ce, arrs, coarsen))

                if var.nu_post > 0:
                    e = track_smooth(e, s, arrs, c_lr_dir, var.nu_post,
                                     level)

            it += 1
            cyc += 1
        return e

    shape, c_lr_dir, coarsen = meta[0]
    arrs = arrays[0]
    de = tuple(jnp.zeros_like(c) for c in r)

    if first and var.nu_init > 0:
        de = track_smooth(de, r, arrs, c_lr_dir, var.nu_init, 0)

    if nlevels == 1:
        de = track_smooth(de, r, arrs, c_lr_dir, var.nu_coarse, 0)
    else:
        if var.nu_pre > 0:
            de = track_smooth(de, r, arrs, c_lr_dir, var.nu_pre, 0)
        cs, ce = _sj(restrict(de, r, arrs, coarsen))
        ce = recurse(cs, ce, 1, cycmax0)
        de = _sj(prolong(de, ce, arrs, coarsen))
        if var.nu_post > 0:
            de = track_smooth(de, r, arrs, c_lr_dir, var.nu_post, 0)

    return de


def _cycle_qc(var):
    """ASCII rendering of the first multigrid cycle's level walk.

    Shown at verb>3 after the first cycle (reference
    solver.py:1817-1843): each grid-spacing row draws a ``\\`` where
    the cycle restricts through that level and a ``/`` where it
    prolongates back, tracing the V/W/F shape from ``var.level_all``.
    """
    levels = np.asarray(var.level_all, dtype=np.int64)
    if levels.size < 2:
        return ""

    steps = levels[1:] - levels[:-1]            # +1 down, -1 up
    mids = np.minimum(levels[1:], levels[:-1]) + 1   # level row crossed
    shown = min(steps.size, 70)

    rows = ["       h_"]
    for row in range(1, int(levels.max()) + 1):
        chars = "".join(
            "\\" if (mids[i] == row and steps[i] > 0)
            else "/" if (mids[i] == row and steps[i] < 0)
            else " " for i in range(shown))
        rows.append(f"   {2 ** row:4}h_ {chars}")
    out = "\n".join(rows) + "\n\n"
    if steps.size > 70:
        out += (f"  (Cycle-QC restricted to first 70 of "
                f"{steps.size} steps.)\n")
    return out


class _Hierarchies:
    """Per-solve cache of multigrid hierarchies per (sc_dir, lr_dir).

    The level ARRAYS depend only on sc_dir (and on whether any line
    relaxation is on, which adds the pre-transposed blocked model
    frames) — lr_dir only changes the static per-level c_lr_dir flags.
    Sharing the arrays across the lr cycling values (e.g. '456') cuts
    the production config's hierarchy memory and blocking work ~3x.
    """

    def __init__(self, vmodel, var):
        self.vmodel = vmodel
        self.var = var
        self._cache = {}
        self._acache = {}

    def get(self, sc_dir, lr_dir):
        key = (int(sc_dir), int(lr_dir))
        if key not in self._cache:
            akey = (int(sc_dir), int(lr_dir) != 0)
            if akey not in self._acache:
                clevel_max = self.var.clevel[min(sc_dir, 3)]
                self._acache[akey] = _build_hierarchy(
                    self.vmodel, sc_dir, lr_dir, clevel_max,
                    placement=getattr(self.var, 'placement', None))
            meta0, arrays = self._acache[akey]
            meta = tuple((shape, _current_lr_dir(lr_dir, shape), coarsen)
                         for shape, _, coarsen in meta0)
            self._cache[key] = (meta, arrays)
        return self._cache[key]


# ==========================================================================
# Host-driven multigrid and Krylov solvers.
# ==========================================================================

class _ConvergenceError(Exception):
    """Raised to force-abort the outer Krylov solver."""


# --------------------------------------------------------------------------
# Transient-backend-failure retries.
#
# Remote TPU backends (tunneled device servers) have multi-minute
# failure windows during which device-to-host reads fail while compute
# and device state survive (measured; see emg3d_tpu.backend).  Every
# host-driven loop below syncs at least a residual norm per cycle, so
# each device step is wrapped in backend.retry_transient, which waits
# the window out and resumes from the (still valid) device state.
# --------------------------------------------------------------------------

_retry_transient = backend.retry_transient


# --------------------------------------------------------------------------
# Whole-cycle executables (EMG3D_TPU_CYCLE_JIT).
#
# The host-driven cycle dispatches ~20-100 level-op executables per
# multigrid cycle.  Over a *tunneled* TPU each dispatch pays network
# latency, so one executable per (hierarchy, next-hierarchy, first)
# triple — the full correction cycle, the split-precision accumulate
# and the next residual norm fused into a single XLA program with ONE
# host sync per cycle — is the latency-optimal shape.  The cost is a
# far larger graph (every smoothing phase of every level inlined), so
# compile is slower: default 'auto' enables it off-CPU only.
#   EMG3D_TPU_CYCLE_JIT = 1 | 0 | auto
# --------------------------------------------------------------------------

def _use_cycle_jit(var):
    # Read per solve (host dispatch) so the knob can be flipped
    # without re-importing; traced executables are unaffected (the
    # knob only selects WHICH jitted functions the host loop calls).
    mode = os.environ.get('EMG3D_TPU_CYCLE_JIT', 'auto')
    if mode == '1':
        return var.placement is None
    if mode == 'auto':
        return (var.placement is None and var.verb <= 3
                and jax.default_backend() != 'cpu')
    return False


class _CycleCfg:
    """The static slice of MGParameters a cycle trace reads."""

    __slots__ = ('cycle', 'cycmax', 'nu_init', 'nu_pre', 'nu_coarse',
                 'nu_post', 'level_all')

    def __init__(self, cycle, cycmax, nu_init, nu_pre, nu_coarse,
                 nu_post):
        self.cycle = cycle
        self.cycmax = cycmax
        self.nu_init = nu_init
        self.nu_pre = nu_pre
        self.nu_coarse = nu_coarse
        self.nu_post = nu_post
        self.level_all = []         # trace-time QC sink


def _cycle_cfg_key(var):
    return (var.cycle, var.cycmax, var.nu_init, var.nu_pre,
            var.nu_coarse, var.nu_post)


@functools.lru_cache(maxsize=None)
def _whole_step_factory(meta, meta2, cfg_key, first):
    """One jitted executable: cycle + accumulate + next residual norm.

    ``meta``/``meta2`` are the (hashable) level-meta tuples of the
    current and the next hierarchy (they differ under semicoarsening /
    line-relaxation cycling); the level arrays are runtime pytree
    arguments, so solves on equal-configuration hierarchies share the
    compiled program.
    """
    cfg = _CycleCfg(*cfg_key)

    # jit_exact: the fused program embeds the EFT accumulate/residual
    # arithmetic, which XLA:CPU's default fusion emitters corrupt.
    @df64.jit_exact
    def step(e_hi, e_lo, s, arrays, arrays2, r):
        de = _cycle_correction(meta, arrays, r, cfg, first,
                               smooth=_smooth_dev, prolong=_prolong_jit)
        e_hi2, e_lo2 = _accumulate_jit(e_hi, e_lo, de)
        r2, l2 = _residual_norm_split_core_jit(e_hi2, e_lo2, s,
                                               arrays2[0])
        return e_hi2, e_lo2, r2, l2

    return step


@functools.lru_cache(maxsize=None)
def _whole_corr_factory(meta, cfg_key, first):
    """One jitted executable: cycle + accumulate, without the residual.

    The final cycle of the MG preconditioner (krylov) returns the
    correction to the Krylov iteration directly — no next residual is
    needed, so the fused program stops after the accumulate.
    """
    cfg = _CycleCfg(*cfg_key)

    @df64.jit_exact
    def step(e_hi, e_lo, r, arrays):
        de = _cycle_correction(meta, arrays, r, cfg, first,
                               smooth=_smooth_dev, prolong=_prolong_jit)
        return _accumulate_jit(e_hi, e_lo, de)

    return step


@_with_sync_dispatch
def multigrid(model, sfield, efield, var, **kwargs):
    """Run multigrid cycles until a termination criterion fires.

    Host-driven outer loop over jitted full-cycle functions; mirrors the
    level-0 loop of reference solver.py:471-649.  ``model`` is a
    VolumeModel; ``sfield``/``efield`` are Fields (efield updated
    in-place) or device tuples when called internally.
    """
    hier = kwargs.pop('hierarchies', None)
    if hier is None:
        hier = _Hierarchies(model, var)

    as_field = hasattr(sfield, 'field')
    if as_field:
        s = _field_to_dev(sfield)
        e_hi = _field_to_dev(efield)
    else:
        s, e_hi = sfield, efield
    if var.placement is not None:
        s = var.placement.place_field(s, var.shape_cells)
        e_hi = var.placement.place_field(e_hi, var.shape_cells)
    e_lo = tuple(jnp.zeros_like(c) for c in e_hi)

    meta, arrays = hier.get(var.sc_dir, var.lr_dir)

    def _initial_residual():
        r, l2_dev = _residual_norm_split_jit(e_hi, e_lo, s, arrays[0])
        return r, float(l2_dev)

    r, l2_last = _retry_transient(_initial_residual, "initial residual")
    l2_stag = np.ones(var.maxcycle) * l2_last

    it = 0
    first = True
    while True:
        l2_prev = l2_last
        l2_stag[(it - 1) % var.maxcycle] = l2_last

        # Cycle semicoarsening and line-relaxation directions (applied
        # to the NEXT residual evaluation, reference solver.py:639-642).
        sc_next = next(var.sc_cycle) if var.sc_cycle else var.sc_dir
        lr_next = next(var.lr_cycle) if var.lr_cycle else var.lr_dir

        def _cycle_step(e_hi=e_hi, e_lo=e_lo, r=r, first=first,
                        meta=meta, arrays=arrays):
            meta2, arrays2 = hier.get(sc_next, lr_next)
            if _use_cycle_jit(var):
                step = _whole_step_factory(
                    meta, meta2, _cycle_cfg_key(var), first)
                e_hi2, e_lo2, r2, l2_dev = step(
                    e_hi, e_lo, s, arrays, arrays2, r)
            else:
                de = _cycle_correction(meta, arrays, r, var, first)
                e_hi2, e_lo2 = _accumulate_call(e_hi, e_lo, de)
                r2, l2_dev = _residual_norm_split_jit(
                    e_hi2, e_lo2, s, arrays2[0])
            return e_hi2, e_lo2, (meta2, arrays2), r2, float(l2_dev)

        e_hi, e_lo, (meta, arrays), r, l2_last = _retry_transient(
            _cycle_step, "multigrid cycle")
        var.sc_dir, var.lr_dir = sc_next, lr_next
        if var.first_cycle:
            var.first_cycle = False
            if var.verb > 3:
                var.cprint(_cycle_qc(var), 3)
        first = False

        it += 1
        var.it += 1

        var.runtime_at_cycle = np.r_[var.runtime_at_cycle, var.time.elapsed]
        var.error_at_cycle = np.r_[var.error_at_cycle, l2_last]

        if var.verb > 3:
            var.cprint(
                f"   [{var.time.now}]   {l2_last/var.l2_refe:.3e} "
                f"after {var.it:3} {var.cycle}-cycles   "
                f"[{l2_last:.3e}, {l2_last/max(l2_prev, 1e-300):.3f}]"
                f"   {var.lr_dir} {var.sc_dir}", 3)

        if _terminate(var, l2_last, l2_stag[(it - 1) % var.maxcycle], it):
            break

    var.l2 = l2_last

    if as_field:
        # Combine the split field on the host in the Field's (float64)
        # dtype so the achieved algebraic accuracy survives the export.
        dtype = efield.field.dtype
        out = fields.Field(efield.grid, dtype=dtype,
                           frequency=efield._frequency)

        def _export():
            return [np.asarray(h, dtype=dtype) + np.asarray(l, dtype=dtype)
                    for h, l in zip(e_hi, e_lo)]

        out.fx, out.fy, out.fz = _retry_transient(_export, "field export")
        efield.field = out.field
    else:
        return tuple(h + l for h, l in zip(e_hi, e_lo))


def _terminate(var, l2_last, l2_stag, it):
    """Termination criteria (reference solver.py:1591-1664)."""
    finished = False
    sslabort = False

    if l2_last < var.tol * var.l2_refe:
        var.exit_message = "CONVERGED"
        finished = True
    elif l2_last > 10 * var.l2_refe or not np.isfinite(l2_last):
        var.exit_message = "DIVERGED"
        finished = True
        sslabort = True
    elif it > 2 and l2_last >= l2_stag:
        var.exit_message = "STAGNATED"
        finished = True
        sslabort = True
    elif it == var.maxit:
        if not var.sslsolver:
            var.exit_message = "MAX. ITERATION REACHED, NOT CONVERGED"
        finished = True

    if finished:
        if var.sslsolver and sslabort:
            raise _ConvergenceError
        elif not var.sslsolver:
            var.cprint("   > " + var.exit_message, 2)

    return finished


@_with_sync_dispatch
def krylov(model, sfield, efield, var):
    """MG-preconditioned Krylov solver (reference solver.py:652-784).

    All three variants — 'bicgstab', 'cgs', 'gcrotmk' — run natively
    with device-side vectors; only O(1) scalars (inner products, small
    least-squares systems) touch the host.
    """
    hier = _Hierarchies(model, var)

    mdev = _vmodel_to_dev(model)
    if var.placement is not None:
        mdev = var.placement.place_level(mdev, var.shape_cells)

    @jax.jit
    def amatvec_dev(e):
        return operator.amat_x(
            *e, mdev['eta_x'], mdev['eta_y'], mdev['eta_z'], mdev['zeta'],
            mdev['hx'], mdev['hy'], mdev['hz'])

    def mg_precond_dev(s):
        """Apply up-to-maxcycle MG cycles to s, starting from zero.

        Mirrors the reference's use of multigrid as the preconditioner
        (solver.py:710-728) incl. divergence/stagnation abort of the
        outer Krylov solver via _ConvergenceError.
        """
        # Distinct zero buffers: the donating accumulate would reject
        # e_lo aliasing e_hi (one buffer donated twice).
        e_hi = tuple(jnp.zeros_like(c) for c in s)
        e_lo = tuple(jnp.zeros_like(c) for c in s)
        l2_stag = np.ones(var.maxcycle) * np.inf
        it = 0
        first = True
        r = s
        l2_refe = None
        while True:
            sc_next = next(var.sc_cycle) if var.sc_cycle else var.sc_dir
            lr_next = next(var.lr_cycle) if var.lr_cycle else var.lr_dir

            def _prec_step(e_hi=e_hi, e_lo=e_lo, r=r, first=first,
                           it=it, s=s):
                meta, arrays = hier.get(var.sc_dir, var.lr_dir)
                last = it + 1 == var.maxit

                if _use_cycle_jit(var):
                    # Whole-cycle executables: one dispatch + one sync
                    # per preconditioner cycle (see the cycle-jit
                    # block above) — the Krylov path is the production
                    # default, so it needs the same latency shape.
                    if last:
                        corr = _whole_corr_factory(
                            meta, _cycle_cfg_key(var), first)
                        e_hi2, e_lo2 = corr(e_hi, e_lo, r, arrays)
                        jax.block_until_ready(e_hi2)
                        return e_hi2, e_lo2, None, None
                    meta2, arrays2 = hier.get(sc_next, lr_next)
                    step = _whole_step_factory(
                        meta, meta2, _cycle_cfg_key(var), first)
                    e_hi2, e_lo2, r2, l2_dev = step(
                        e_hi, e_lo, s, arrays, arrays2, r)
                    return e_hi2, e_lo2, r2, float(l2_dev)

                de = _cycle_correction(meta, arrays, r, var, first)
                e_hi2, e_lo2 = _accumulate_call(e_hi, e_lo, de)
                if last:
                    jax.block_until_ready(e_hi2)
                    return e_hi2, e_lo2, None, None
                _, arrays2 = hier.get(sc_next, lr_next)
                r2, l2_dev = _residual_norm_split_jit(
                    e_hi2, e_lo2, s, arrays2[0])
                return e_hi2, e_lo2, r2, float(l2_dev)

            e_hi, e_lo, r2, l2_last = _retry_transient(
                _prec_step, "MG preconditioner cycle")
            var.sc_dir, var.lr_dir = sc_next, lr_next
            if var.first_cycle:
                var.first_cycle = False
                if var.verb > 3:
                    var.cprint(_cycle_qc(var), 3)
            first = False
            it += 1
            var.it += 1

            if it == var.maxit:
                break
            r = r2
            if l2_refe is None:
                l2_refe = max(l2_last, 1e-300)

            # Inner termination (maxit = maxcycle when preconditioning).
            if l2_last < var.tol * var.l2_refe:
                break
            if l2_last > 10 * l2_refe or not np.isfinite(l2_last):
                var.exit_message = "DIVERGED"
                raise _ConvergenceError
            if it > 2 and l2_last >= l2_stag[(it - 1) % var.maxcycle]:
                var.exit_message = "STAGNATED"
                raise _ConvergenceError
            l2_stag[(it - 1) % var.maxcycle] = l2_last
        return tuple(h + l for h, l in zip(e_hi, e_lo))

    def callback():
        var.ssl_it += 1
        var.runtime_at_cycle = np.r_[var.runtime_at_cycle, var.time.elapsed]
        var.error_at_cycle = np.r_[var.error_at_cycle, var.l2]
        if var.verb > 3:
            var.cprint(
                f"   [{var.time.now}]   {var.l2/var.l2_refe:.3e} "
                f" after {var.ssl_it:3} {var.sslsolver}-cycles", 3)

    s = _field_to_dev(sfield)
    e = _field_to_dev(efield)
    if var.placement is not None:
        s = var.placement.place_field(s, var.shape_cells)
        e = var.placement.place_field(e, var.shape_cells)

    native = {'bicgstab': _bicgstab, 'cgs': _cgs,
              'gcrotmk': _gcrotmk}[var.sslsolver]
    try:
        e, i = native(amatvec_dev, mg_precond_dev if var.cycle
                      else None, s, e, var, callback)
    except _ConvergenceError:
        i = -1
        e = tuple(jnp.zeros_like(c) for c in s)
        var.exit_message += " (returned field is zero)"

    if i < 0:
        if var.exit_message == '':
            var.exit_message = f"Error in {var.sslsolver} ({i})"
    elif i > 0:
        var.exit_message = "MAX. ITERATION REACHED, NOT CONVERGED"
    else:
        var.exit_message = "CONVERGED"
    var.cprint("   > " + var.exit_message, 2)

    out = _dev_to_field(e, efield.grid, efield._frequency,
                        efield.field.dtype)
    efield.field = out.field


def _dot(a, b):
    """Conjugated inner product over field tuples."""
    return complex(sum(jnp.vdot(x, y) for x, y in zip(a, b)))


def _norm_tup(a):
    return float(jnp.sqrt(sum(jnp.sum(jnp.abs(x) ** 2) for x in a)))


def _axpy(a, alpha, b):
    """a + alpha*b over tuples."""
    return tuple(x + alpha * y for x, y in zip(a, b))


def _bicgstab(amatvec, precond, b, x0, var, callback):
    """Preconditioned BiCGSTAB with device-side vectors.

    Standard right-preconditioned BiCGSTAB (van der Vorst); matches the
    role of scipy.sparse.linalg.bicgstab in the reference
    (solver.py:759-765).  Returns (x, info).
    """
    bnrm = _norm_tup(b)
    if bnrm == 0.0:
        return b, 0

    x = x0
    r = tuple(bb - aa for bb, aa in zip(b, amatvec(x)))
    rhat = r
    rho = alpha = omega = 1.0 + 0j
    v = p = tuple(jnp.zeros_like(c) for c in b)

    atol = max(1e-30, var.tol * bnrm)

    for it in range(var.ssl_maxit):
        rho_new = _dot(rhat, r)
        if rho_new == 0:
            return x, -10
        if it > 0:
            beta = (rho_new / rho) * (alpha / omega)
            p = _axpy(r, beta, _axpy(p, -omega, v))
        else:
            p = r
        rho = rho_new

        phat = precond(p) if precond else p
        v = amatvec(phat)
        denom = _dot(rhat, v)
        if denom == 0:
            return x, -11
        alpha = rho / denom
        s = _axpy(r, -alpha, v)

        if _norm_tup(s) < atol:
            x = _axpy(x, alpha, phat)
            var.l2 = _norm_tup(s)
            callback()
            return x, 0

        shat = precond(s) if precond else s
        t = amatvec(shat)
        tt = _dot(t, t)
        if tt == 0:
            return x, -12
        omega = _dot(t, s) / tt

        x = _axpy(_axpy(x, alpha, phat), omega, shat)
        r = _axpy(s, -omega, t)

        var.l2 = _norm_tup(r)
        callback()

        if var.l2 < atol:
            return x, 0
        if omega == 0:
            return x, -13

    return x, var.ssl_maxit


def _cgs(amatvec, precond, b, x0, var, callback):
    """Preconditioned CGS with device-side vectors.

    Conjugate Gradient Squared (Sonneveld), right-preconditioned;
    fills the role of scipy.sparse.linalg.cgs in the reference
    (solver.py:759-765) without the per-matvec host round trip.
    Returns (x, info) with the scipy info convention.
    """
    bnrm = _norm_tup(b)
    if bnrm == 0.0:
        return b, 0

    x = x0
    r = tuple(bb - aa for bb, aa in zip(b, amatvec(x)))
    rhat = r
    rho = 1.0 + 0j
    u = q = p = tuple(jnp.zeros_like(c) for c in b)

    atol = max(1e-30, var.tol * bnrm)

    for it in range(var.ssl_maxit):
        rho_new = _dot(rhat, r)
        if rho_new == 0:
            return x, -10
        if it > 0:
            beta = rho_new / rho
            u = _axpy(r, beta, q)
            p = _axpy(u, beta, _axpy(q, beta, p))
        else:
            u = p = r
        rho = rho_new

        phat = precond(p) if precond else p
        v = amatvec(phat)
        denom = _dot(rhat, v)
        if denom == 0:
            return x, -11
        alpha = rho / denom
        q = _axpy(u, -alpha, v)

        uq = tuple(a + c for a, c in zip(u, q))
        uqhat = precond(uq) if precond else uq
        x = _axpy(x, alpha, uqhat)
        r = _axpy(r, -alpha, amatvec(uqhat))

        var.l2 = _norm_tup(r)
        callback()
        if var.l2 < atol:
            return x, 0

    return x, var.ssl_maxit


def _gcrotmk(amatvec, precond, b, x0, var, callback, m=20, k=None):
    """Preconditioned GCROT(m,k) with device-side vectors.

    Recycled-subspace Krylov method (Hicken & Zingg's GCROT(m,k) with
    oldest-out truncation); fills the role of
    scipy.sparse.linalg.gcrotmk in the reference (solver.py:759-765).
    Each outer iteration runs a flexible GMRES(m) inner loop deflated
    against the recycle space C (A·U = C, Cᴴ C = I), forms one new
    (c, u) pair from the inner solution, applies the 1-D projection to
    x and r, and truncates the space to ``k`` pairs.  The large vectors
    (Krylov basis, recycle pairs) stay on the device; only the Arnoldi
    scalars and the (≤ m+1) × m least-squares problem live on the host.
    Returns (x, info) with the scipy info convention.
    """
    k = k or m
    bnrm = _norm_tup(b)
    if bnrm == 0.0:
        return b, 0
    atol = max(1e-30, var.tol * bnrm)

    x = x0
    r = tuple(bb - aa for bb, aa in zip(b, amatvec(x)))
    CU = []                          # recycle pairs (c, u), A u = c

    for outer in range(var.ssl_maxit):
        beta = _norm_tup(r)
        if beta < atol:
            var.l2 = beta
            return x, 0

        # Flexible GMRES(m) on r, deflated against span(C).
        V = [tuple(c / beta for c in r)]
        Z = []                                    # preconditioned basis
        H = np.zeros((m + 1, m), dtype=np.complex128)
        B = np.zeros((max(len(CU), 1), m), dtype=np.complex128)
        y = None
        j_used = 0
        for j in range(m):
            z = precond(V[j]) if precond else V[j]
            w = amatvec(z)
            Z.append(z)
            for i, (c, _) in enumerate(CU):       # deflate
                B[i, j] = _dot(c, w)
                w = _axpy(w, -B[i, j], c)
            for i in range(j + 1):                # Arnoldi (MGS)
                H[i, j] = _dot(V[i], w)
                w = _axpy(w, -H[i, j], V[i])
            H[j + 1, j] = _norm_tup(w)
            j_used = j + 1
            if H[j + 1, j] >= 1e-14 * beta:
                V.append(tuple(c / H[j + 1, j] for c in w))

            # Inner least squares + early exit at tolerance.
            e1 = np.zeros(j_used + 1, dtype=np.complex128)
            e1[0] = beta
            y, *_ = np.linalg.lstsq(
                H[:j_used + 1, :j_used], e1, rcond=None)
            inner_res = np.linalg.norm(
                e1 - H[:j_used + 1, :j_used] @ y)
            if H[j + 1, j] < 1e-14 * beta or inner_res < atol:
                break

        # New recycle pair from the inner solution:
        #   u~ = Z y − U (B y)   (so that A u~ = V H̄ y ⊥ C),
        #   c~ = V (H̄ y).
        ut = tuple(jnp.zeros_like(c) for c in b)
        for j in range(j_used):
            ut = _axpy(ut, y[j], Z[j])
        if CU:
            By = B[:len(CU), :j_used] @ y
            for i, (_, u) in enumerate(CU):
                ut = _axpy(ut, -By[i], u)
        Hy = H[:j_used + 1, :j_used] @ y
        ct = tuple(jnp.zeros_like(c) for c in b)
        for i in range(min(j_used + 1, len(V))):
            ct = _axpy(ct, Hy[i], V[i])

        cnrm = _norm_tup(ct)
        if cnrm == 0.0:
            return x, -11
        c_new = tuple(c / cnrm for c in ct)
        u_new = tuple(c / cnrm for c in ut)

        alpha = _dot(c_new, r)
        x = _axpy(x, alpha, u_new)
        r = _axpy(r, -alpha, c_new)

        CU.append((c_new, u_new))
        if len(CU) > k:
            CU.pop(0)

        var.l2 = _norm_tup(r)
        callback()
        if var.l2 < atol:
            return x, 0

    return x, var.ssl_maxit


# ==========================================================================
# Reference-parity functional API (Field-level wrappers).
# ==========================================================================

def smoothing(model, sfield, efield, nu, lr_dir):
    """Apply nu Gauss-Seidel steps (in-place on efield).

    Reference: solver.py:788-846.
    """
    arrs = _vmodel_to_dev(model)
    c_lr_dir = _current_lr_dir(lr_dir, model.grid.shape_cells)
    e = _field_to_dev(efield)
    s = _field_to_dev(sfield)
    e = _smooth_dev(e, s, arrs, c_lr_dir, nu)
    out = _dev_to_field(e, efield.grid, efield._frequency,
                        efield.field.dtype)
    efield.field = out.field


def residual(model, sfield, efield, norm=False):
    """Residual r = s - A e as a Field (or its l2-norm).

    Reference: solver.py:1022-1070.
    """
    arrs = _vmodel_to_dev(model)
    e = _field_to_dev(efield)
    s = _field_to_dev(sfield)
    r = _residual_dev(e, s, arrs)
    if norm:
        return float(operator.residual_norm(*r))
    return _dev_to_field(r, sfield.grid, sfield._frequency,
                         sfield.field.dtype)


def restriction(model, sfield, res, sc_dir):
    """Restrict grid, model, and residual (reference solver.py:849-944)."""
    coarsen = _coarsen_flags(sc_dir)

    ch = [np.diff(getattr(model.grid, 'nodes_' + c)[::2]) if coarsen[i]
          else model.grid.h[i] for i, c in enumerate('xyz')]
    cgrid = meshes.BaseMesh(ch, model.grid.origin)

    class _VolumeModel:
        pass

    cmodel = _VolumeModel()
    cmodel.case = model.case
    cmodel.grid = cgrid
    cmodel._eta_x = np.asarray(transfer.restrict_model_parameters(
        np.asarray(model.eta_x), coarsen))
    if model.case in ['HTI', 'triaxial']:
        cmodel._eta_y = np.asarray(transfer.restrict_model_parameters(
            np.asarray(model.eta_y), coarsen))
    else:
        cmodel._eta_y = cmodel._eta_x
    if model.case in ['VTI', 'triaxial']:
        cmodel._eta_z = np.asarray(transfer.restrict_model_parameters(
            np.asarray(model.eta_z), coarsen))
    else:
        cmodel._eta_z = cmodel._eta_x
    cmodel.zeta = np.asarray(transfer.restrict_model_parameters(
        np.asarray(model.zeta), coarsen))
    cmodel.eta_x = cmodel._eta_x
    cmodel.eta_y = cmodel._eta_y
    cmodel.eta_z = cmodel._eta_z

    # Weights.
    rw = []
    for i, c in enumerate('xyz'):
        if coarsen[i]:
            wl, w0, wr = transfer.restrict_weights(
                getattr(model.grid, 'nodes_' + c),
                getattr(model.grid, 'cell_centers_' + c),
                model.grid.h[i],
                getattr(cgrid, 'nodes_' + c),
                getattr(cgrid, 'cell_centers_' + c), ch[i])
            rw.append((jnp.asarray(wl), jnp.asarray(w0), jnp.asarray(wr)))
        else:
            rw.append(None)

    r = _field_to_dev(res)
    cs = transfer.restrict(*r, tuple(rw), coarsen)

    csfield = _dev_to_field(cs, cgrid, sfield._frequency,
                            sfield.field.dtype)
    cefield = fields.Field(cgrid, dtype=sfield.field.dtype,
                           frequency=sfield._frequency)

    return cmodel, csfield, cefield


def prolongation(efield, cefield, sc_dir):
    """Prolong coarse correction onto the fine field (in-place).

    Reference: solver.py:947-1019.
    """
    coarsen = _coarsen_flags(sc_dir)
    grid, cgrid = efield.grid, cefield.grid

    pm = []
    for i, c in enumerate('xyz'):
        if coarsen[i]:
            idx, w = transfer.prolong_meta(
                getattr(cgrid, 'nodes_' + c), getattr(grid, 'nodes_' + c))
            pm.append((jnp.asarray(idx), jnp.asarray(w)))
        else:
            pm.append(None)

    e = _field_to_dev(efield)
    ce = _field_to_dev(cefield)
    e = transfer.prolong(*e, *ce, tuple(pm), coarsen)
    out = _dev_to_field(e, grid, efield._frequency, efield.field.dtype)
    efield.field = out.field


class RegularGridProlongator:
    """2-D bilinear prolongation with precomputed weights.

    API-parity class (reference solver.py:1385-1478); the solver itself
    uses the separable 1-D metadata in emg3d_tpu.ops.transfer.
    """

    def __init__(self, cx, cy, x, y):
        self.ix, self.wx = transfer.prolong_meta(np.asarray(cx),
                                                 np.asarray(x))
        self.iy, self.wy = transfer.prolong_meta(np.asarray(cy),
                                                 np.asarray(y))
        self.size = x.size * y.size

    def __call__(self, values):
        lo = values[self.ix][:, self.iy]
        v = ((1 - self.wx[:, None]) * (1 - self.wy[None, :]) * lo
             + self.wx[:, None] * (1 - self.wy[None, :])
             * values[self.ix + 1][:, self.iy]
             + (1 - self.wx[:, None]) * self.wy[None, :]
             * values[self.ix][:, self.iy + 1]
             + self.wx[:, None] * self.wy[None, :]
             * values[self.ix + 1][:, self.iy + 1])
        # Fortran-raveled, matching the reference's return convention.
        return v.ravel(order='F')


# ==========================================================================
# Parameter dataclass.
# ==========================================================================

@dataclass
class MGParameters:
    """Multigrid solver settings and runtime state.

    Mirrors the reference dataclass (solver.py:1074-1381): validation of
    semicoarsening/linerelaxation cycles, per-dimension maximum coarsening
    levels, and the bookkeeping used by the drivers.
    """

    verb: int
    sslsolver: Union[str, bool]
    semicoarsening: Union[int, bool]
    linerelaxation: Union[int, bool]
    shape_cells: tuple

    cycle: Union[str, None] = 'F'
    tol: float = 1e-6
    maxit: int = 50
    nu_init: int = 0
    nu_pre: int = 2
    nu_coarse: int = 1
    nu_post: int = 2
    clevel: int = -1
    return_info: bool = False
    log: int = 0

    def __post_init__(self):
        self.level_all = list()
        self.first_cycle = True
        self.it = 0
        self.ssl_it = 0
        self.l2 = 1.0
        self.l2_refe = 1.0
        self._max_level()

        self.exit_message = ''
        self.log_message = ''
        self.placement = None   # GridPlacement for domain-decomposition
        self.time = utils.Timer()
        self.runtime_at_cycle = np.array([0.])
        self.error_at_cycle = np.array([0.])
        self.do_return = True

        self._semicoarsening()
        self._linerelaxation()
        self._solver_and_cycle()

    def __repr__(self):
        return (
            f"   MG-cycle       : {self.cycle!r:17}"
            f"   sslsolver : {self.sslsolver!r}\n"
            f"   semicoarsening : {self._repr_sc_dir:17}"
            f"   tol       : {self.tol}\n"
            f"   linerelaxation : {self._repr_lr_dir:17}"
            f"   maxit     : {self._repr_maxit}\n"
            f"   nu_{{i,1,c,2}}   : {self.nu_init}, {self.nu_pre},"
            f" {self.nu_coarse}, {self.nu_post}       "
            f"   verb      : {self.verb}\n"
            f"   Original grid  : {self.shape_cells[0]:3} x"
            f" {self.shape_cells[1]:3} x {self.shape_cells[2]:3}\n"
        )

    def cprint(self, info, verbosity, **kwargs):
        """Print and log ``info`` if sufficiently verbose."""
        if self.verb > verbosity:
            if self.log != 0:
                self.log_message += str(info) + '\n'
            if self.log >= 0:
                print(info, **kwargs)

    def _max_level(self):
        """Per-dimension max coarsening level (solver.py:1202-1270).

        Each dimension coarsens while its cell count is even and > 2;
        a user-set ``clevel`` >= 0 caps every dimension's depth.  The
        result is the per-sc_dir depth table (index 0: standard
        coarsening; 1-3: the dimension named by sc_dir is excluded).
        """
        clevel = np.zeros(3, dtype=np.int64)
        for i in range(3):
            n = self.shape_cells[i]
            while n % 2 == 0 and n > 2:
                clevel[i] += 1
                n /= 2

        if self.clevel >= 0:
            clevel = np.minimum(clevel, self.clevel)

        self.clevel = np.array([
            max(clevel[0], clevel[1], clevel[2]),  # sc_dir=0
            max(clevel[1], clevel[2]),             # sc_dir=1
            max(clevel[0], clevel[2]),             # sc_dir=2
            max(clevel[0], clevel[1]),             # sc_dir=3
        ])

        if np.any(np.array(self.shape_cells) < 2):
            raise ValueError(
                "Nr. of cells must be at least two in each direction. "
                f"Provided shape: {self.shape_cells}.")

    def _semicoarsening(self):
        """Set up semicoarsening cycling (solver.py:1272-1304)."""
        if self.semicoarsening is True:
            sc_cycle = np.array([1, 2, 3])
            self.sc_cycle = itertools.cycle(sc_cycle)
        elif self.semicoarsening in np.arange(4):
            sc_cycle = np.array([int(self.semicoarsening)])
            self.sc_cycle = False
        else:
            sc_cycle = np.array(
                [int(x) for x in str(abs(int(self.semicoarsening)))])
            self.sc_cycle = itertools.cycle(sc_cycle)
            if np.any(sc_cycle < 0) or np.any(sc_cycle > 3):
                raise ValueError(
                    "`semicoarsening` must be one of {False;True;0;1;2;3} "
                    "or a combination of {0;1;2;3} to cycle. "
                    f"Provided: {self.semicoarsening}.")

        if self.sc_cycle:
            self.sc_dir = next(self.sc_cycle)
        else:
            self.sc_dir = sc_cycle[0]

        self.semicoarsening = self.sc_dir != 0
        self._repr_sc_dir = f"{self.semicoarsening} {sc_cycle}"
        self.raw_sc_cycle = sc_cycle

    def _linerelaxation(self):
        """Set up line-relaxation cycling (solver.py:1306-1339)."""
        if self.linerelaxation is True:
            lr_cycle = np.array([4, 5, 6])
            self.lr_cycle = itertools.cycle(lr_cycle)
        elif self.linerelaxation in np.arange(8):
            lr_cycle = np.array([int(self.linerelaxation)])
            self.lr_cycle = False
        else:
            lr_cycle = np.array(
                [int(x) for x in str(abs(int(self.linerelaxation)))])
            self.lr_cycle = itertools.cycle(lr_cycle)
            if np.any(lr_cycle < 0) or np.any(lr_cycle > 7):
                raise ValueError(
                    "`linerelaxation` must be one of "
                    "{False;True;0;...;7} or a combination of {1;...;7} "
                    f"to cycle. Provided: {self.linerelaxation}.")

        if self.lr_cycle:
            self.lr_dir = next(self.lr_cycle)
        else:
            self.lr_dir = lr_cycle[0]

        self.linerelaxation = self.lr_dir != 0
        self._repr_lr_dir = f"{self.linerelaxation} {lr_cycle}"
        self.raw_lr_cycle = lr_cycle

    def _solver_and_cycle(self):
        """Validate solver/cycle combination (solver.py:1341-1381)."""
        solvers = ['bicgstab', 'cgs', 'gcrotmk']
        if self.sslsolver is True:
            self.sslsolver = 'bicgstab'
        elif self.sslsolver is not False and self.sslsolver not in solvers:
            raise ValueError(
                f"`sslsolver` must be True, False, or one of {solvers}. "
                f"Provided: {self.sslsolver!r}.")

        if self.cycle not in ['F', 'V', 'W', None]:
            raise ValueError(
                "`cycle` must be one of {'F';'V';'W';None}. "
                f"Provided: {self.cycle}.")

        if self.cycle in ['F', 'W']:
            self.cycmax = 2
        else:
            self.cycmax = 1

        if not self.sslsolver and not self.cycle:
            raise ValueError(
                "At least `cycle` or `sslsolver` is required. Provided "
                f"input: cycle={self.cycle}; sslsolver={self.sslsolver}.")

        self.ssl_maxit = 0
        self._repr_maxit = f"{self.maxit}"
        self.maxcycle = max(len(self.raw_sc_cycle), len(self.raw_lr_cycle))
        if self.sslsolver:
            self.ssl_maxit = self.maxit
            if self.cycle is not None:
                self.maxit = self.maxcycle
                self._repr_maxit += f" ({self.maxit})"
