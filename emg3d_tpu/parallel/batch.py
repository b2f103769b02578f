"""Batched multi-(source, frequency) solves over a device mesh.

The reference parallelizes a survey by pickling one task per
(source, frequency) to a process pool (emg3d/_multiprocessing.py:33-69,
emg3d/simulations.py:860-866).  Here the tasks become a leading batch
axis: model parameters that depend on frequency (eta) and the source
fields are stacked, every multigrid operation is ``jax.vmap``-ed over
that axis, and the axis is sharded over the devices of a
``jax.sharding.Mesh`` — XLA partitions the batch with zero collectives.

All tasks in one batched solve must share the grid; the Simulation
layer groups tasks by computational grid and runs one batched solve per
group, so every gridding mode batches (``Simulation._batch_groups``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from emg3d_tpu import fields, models, solver
from emg3d_tpu.ops import df64

__all__ = ["solve_batch", "solve_batch_fields", "make_task_mesh"]


def make_task_mesh(n_devices=None, axis="task"):
    """A 1-D device mesh over (the first ``n_devices``) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _axes_of(arrs):
    """vmap in_axes for a level's array dict.

    Two hierarchy layouts exist (see _build_hierarchy_batched):
    stacked eta (4-D, batched over tasks) or shared eta (3-D, one copy)
    with a per-task ``eta_scale`` scalar.
    """
    axes = {k: (0 if k in ("eta_scale", "eta_scale_lo")
                or (k.startswith("eta_") and arrs[k].ndim == 4)
                else None) for k in arrs}
    # Pre-blocked smoother operands in the stacked (per-task-eta)
    # layout: the three eta block-tuples carry a leading task axis,
    # the zeta blocks stay shared (frequency-independent).
    if "blk" in arrs and arrs["blk"][0][0].ndim == 4:
        axes["blk"] = (0, 0, 0, None)
    if "blk_t" in arrs and next(iter(arrs["blk_t"].values()))[0][0].ndim == 4:
        axes["blk_t"] = {ax: (0, 0, 0, None) for ax in arrs["blk_t"]}
    return axes


def _scaled(arrs):
    """Materialize a task's eta from the shared copy + its scale.

    Inside a vmapped per-task function ``eta_scale`` is a scalar; the
    multiply stays inside the task's XLA program (fused into the
    stencil consumers), so the B-fold eta storage never exists in HBM.

    The level-0 df64 companions (``eta_*_lo``, consumed by the split-
    precision residual) are rescaled in split arithmetic against the
    split scale (``eta_scale_lo``): a plain hi-only multiply would pair
    (scale*hi) with task-0's lo and silently degrade the convergence
    criterion to ~f32 accuracy for any task with scale != 1.
    """
    if "eta_scale" not in arrs:
        return arrs
    out = dict(arrs)
    scale = out.pop("eta_scale")
    scale_lo = out.pop("eta_scale_lo", None)
    for k in ("eta_x", "eta_y", "eta_z"):
        if scale_lo is not None and k + "_lo" in out:
            out[k], out[k + "_lo"] = df64.scale_split(
                out[k], out[k + "_lo"], scale, scale_lo)
        else:
            out[k] = scale * out[k]
    if "blk" in out:
        # Pre-blocked smoother operands (hi parts only — the blocked
        # layout feeds the smoother, never the df64 residual): rescale
        # the eta block-tuples; zeta is frequency-independent.
        bx, by, bz, bzeta = out["blk"]
        out["blk"] = (tuple(scale * b for b in bx),
                      tuple(scale * b for b in by),
                      tuple(scale * b for b in bz), bzeta)
    if "blk_t" in out:
        # Same rescale for the pre-transposed y-/z-frame copies.
        out["blk_t"] = {
            ax: (tuple(scale * b for b in fx),
                 tuple(scale * b for b in fy),
                 tuple(scale * b for b in fz), fzeta)
            for ax, (fx, fy, fz, fzeta) in out["blk_t"].items()}
    return out


@functools.partial(jax.jit, static_argnames=("c_lr_dir", "nu"))
def _bsmooth(e, s, arrs, c_lr_dir, nu):
    def fn(e, s, arrs):
        return solver._smooth_dev(e, s, _scaled(arrs), c_lr_dir, nu)
    return jax.vmap(fn, in_axes=(0, 0, _axes_of(arrs)))(e, s, arrs)


@functools.partial(jax.jit, static_argnames=("coarsen",))
def _brestrict(e, s, arrs, coarsen):
    """Batched fused residual+restrict -> (coarse source, zero guess).

    Return contract matches solver._restrict_jit: the zero coarse
    guess rides in the same executable.
    """
    def fn(e, s, arrs):
        arrs = _scaled(arrs)
        res = solver._residual_dev(e, s, arrs)
        from emg3d_tpu.ops import transfer
        return transfer.restrict(*res, arrs["rw"], coarsen)
    cs = jax.vmap(fn, in_axes=(0, 0, _axes_of(arrs)))(e, s, arrs)
    return cs, tuple(jnp.zeros_like(c) for c in cs)


@functools.partial(jax.jit, static_argnames=("coarsen",))
def _bprolong(e, ce, arrs, coarsen):
    def fn(e, ce, arrs):
        from emg3d_tpu.ops import transfer
        return transfer.prolong(*e, *ce, arrs["pm"], coarsen)
    return jax.vmap(fn, in_axes=(0, 0, _axes_of(arrs)))(e, ce, arrs)


@jax.jit
def _bresnorm(e, s, arrs):
    from emg3d_tpu.ops import operator

    def fn(e, s, arrs):
        return operator.residual_norm(
            *solver._residual_dev(e, s, _scaled(arrs)))
    return jax.vmap(fn, in_axes=(0, 0, _axes_of(arrs)))(e, s, arrs)


@df64.jit_exact
def _bresidual_norm_split_core(e_hi, e_lo, s, arrs):
    """Batched split-field residual + per-task norms (B,).

    Compiled via df64.jit_exact (EFT arithmetic; see there)."""
    from emg3d_tpu.ops import operator

    def fn(eh, el, s_, a):
        a = _scaled(a)
        if eh[0].dtype in (jnp.complex64, jnp.float32):
            return df64.residual_norm_split_df64(eh, el, s_, a)
        r_hi = solver._residual_dev(eh, s_, a)
        a_lo = operator.amat_x(
            *el, a["eta_x"], a["eta_y"], a["eta_z"], a["zeta"],
            a["hx"], a["hy"], a["hz"])
        r = tuple(h - l for h, l in zip(r_hi, a_lo))
        return r, operator.residual_norm(*r)

    return jax.vmap(fn, in_axes=(0, 0, 0, _axes_of(arrs)))(
        e_hi, e_lo, s, arrs)


@jax.jit
def _bresidual_norm_split_f64(e_hi, e_lo, s, arrs):
    """CPU fast-exact batched split residual in native complex128
    (mirror of solver._residual_norm_split_f64_jit; traced under
    enable_x64 by the dispatcher below)."""
    from emg3d_tpu.ops import operator

    cdt = e_hi[0].dtype

    def up(x):
        return x.astype(jnp.complex128 if jnp.iscomplexobj(x)
                        else jnp.float64)

    def fn(eh, el, s_, a):
        eta, zeta, hs = solver._f64_coeffs(a)
        if "eta_scale" in a:
            sc = up(a["eta_scale"]) + up(a.get(
                "eta_scale_lo", jnp.zeros((), a["eta_scale"].dtype)))
            eta = [sc * c for c in eta]
        e = tuple(up(h) + up(l) for h, l in zip(eh, el))
        ae = operator.amat_x(*e, *eta, zeta, *hs)
        r = tuple(up(c) - x for c, x in zip(s_, ae))
        l2 = operator.residual_norm(*r)
        return (tuple(c.astype(cdt) for c in r),
                l2.astype(jnp.float32))

    return jax.vmap(fn, in_axes=(0, 0, 0, _axes_of(arrs)))(
        e_hi, e_lo, s, arrs)


def _bresidual_norm_split(e_hi, e_lo, s, arrs):
    """Platform-adaptive batched split residual (host dispatch):
    f32 on CPU -> native-f64 evaluation; else the core executable."""
    if (e_hi[0].dtype in (jnp.complex64, jnp.float32)
            and jax.default_backend() == 'cpu'):
        with jax.enable_x64(True):
            return _bresidual_norm_split_f64(e_hi, e_lo, s, arrs)
    return _bresidual_norm_split_core(e_hi, e_lo, s, arrs)


def _cycle_correction_batched(meta, arrays, r, var, first):
    """Defect-correction cycle for the whole batch (vmapped level ops)."""
    return solver._cycle_correction(
        meta, arrays, r, var, first, smooth=_bsmooth, restrict=_brestrict,
        prolong=_bprolong)


class _BatchHierarchies:
    """Per-solve cache of stacked hierarchies per (sc_dir, lr_dir).

    Batched mirror of solver._Hierarchies: semicoarsening and
    line-relaxation direction cycling ask for a different coarsening
    path each cycle; each is built (and stacked/sharded) once on first
    use and reused for the rest of the solve.
    """

    def __init__(self, vmodels, var, mesh=None, axis="task", scales=None):
        self.vmodels = vmodels
        self.var = var
        self.mesh = mesh
        self.axis = axis
        self.scales = scales
        self._cache = {}

    def get(self, sc_dir, lr_dir):
        key = (int(sc_dir), int(lr_dir))
        if key not in self._cache:
            clevel_max = self.var.clevel[min(sc_dir, 3)]
            self._cache[key] = _build_hierarchy_batched(
                self.vmodels, sc_dir, lr_dir, clevel_max,
                mesh=self.mesh, axis=self.axis, scales=self.scales)
        return self._cache[key]


# --------------------------------------------------------------------------
# Active-shrink (straggler recompaction).
#
# Converged tasks still occupy lanes: the SPMD batch runs matvecs and
# preconditioner cycles for them in lockstep.  When enough tasks have
# converged, the batch is recompacted to HALF (quarter, ...) its size —
# halving bounds the number of distinct batch shapes (and therefore XLA
# recompiles) to log2(B), and the halved sizes recur across the solves
# of an inversion loop, so their executables amortize.  Opt-in via
# EMG3D_TPU_BATCH_SHRINK=1 (default off until hardware profiles price
# recompile-vs-straggler; read per solve).
# --------------------------------------------------------------------------


def _shrink_on():
    import os
    return os.environ.get("EMG3D_TPU_BATCH_SHRINK", "0") == "1"


def _shrink_size(ntask, n_active, nd):
    """Largest halving of ntask holding all active tasks, a multiple
    of the mesh size nd."""
    nd = max(int(nd), 1)
    floor = max(int(n_active), nd, 1)
    new = int(ntask)
    while new // 2 >= floor and (new // 2) % nd == 0:
        new //= 2
    return new


def _keep_lanes(active, new_n):
    """Lane selection for a shrink: every active lane, padded with
    already-converged lanes up to new_n (their x stays frozen by the
    active gating; they only waste the smaller batch's flops)."""
    act = np.flatnonzero(active)
    inact = np.flatnonzero(~active)
    return np.concatenate([act, inact[:new_n - act.size]])


def _take_fields(fs, keep, spec):
    idx = jnp.asarray(keep)
    out = tuple(jnp.take(c, idx, axis=0) for c in fs)
    if spec is not None:
        out = tuple(jax.device_put(c, spec) for c in out)
    return out


def _is_batched_key(k, v):
    return (k in ("eta_scale", "eta_scale_lo")
            or (k.startswith("eta_") and v.ndim == 4))


def _take_level(arrs, keep, spec):
    idx = jnp.asarray(keep)
    out = dict(arrs)
    for k, v in arrs.items():
        if _is_batched_key(k, v):
            t = jnp.take(v, idx, axis=0)
            if spec is not None:
                t = jax.device_put(t, spec)
            out[k] = t
    return out


class _SelectedHierarchies:
    """Lane-sliced view of a (possibly already sliced) hierarchy cache."""

    def __init__(self, parent, keep, spec):
        self.parent = parent
        self.keep = np.asarray(keep)
        self.spec = spec
        self.mesh = parent.mesh
        self.axis = parent.axis
        self._cache = {}

    def get(self, sc_dir, lr_dir):
        key = (int(sc_dir), int(lr_dir))
        if key not in self._cache:
            meta, levels = self.parent.get(sc_dir, lr_dir)
            self._cache[key] = (meta, [
                _take_level(lvl, self.keep, self.spec) for lvl in levels])
        return self._cache[key]


# --------------------------------------------------------------------------
# Batched MG-preconditioned BiCGSTAB.
#
# The reference's production configuration (sslsolver + semicoarsening
# + linerelaxation, emg3d/solver.py:82-140) for the whole survey batch
# at once: the Krylov scalars become (B,) device arrays — one
# (rho, alpha, omega) triple per task — and every vector op is batched
# over the task axis, so XLA shards the entire iteration over the mesh
# with zero collectives.  Per-task convergence is handled by an
# ``active`` mask that freezes a task's x/r updates once its residual
# passes tolerance; guarded divisions make post-breakdown algebra inert
# (zeros) instead of NaN.
# --------------------------------------------------------------------------


def _bdot(a, b):
    """Per-task conjugated inner product over field tuples -> (B,)."""
    return sum(jnp.sum(jnp.conj(x) * y, axis=(1, 2, 3))
               for x, y in zip(a, b))


def _bnorm_dev(a):
    """Per-task l2 norm over field tuples -> (B,) real."""
    return jnp.sqrt(sum(jnp.sum(jnp.abs(x) ** 2, axis=(1, 2, 3))
                        for x in a))


def _guarded_div(num, den):
    """num/den with 0 on breakdown (zero denominator OR a non-finite
    quotient, e.g. a denormal-underflow denominator overflowing the
    ratio) so broken-down tasks' algebra stays inert instead of NaN."""
    bad = den == 0
    q = jnp.where(bad, 0, num / jnp.where(bad, 1, den))
    return jnp.where(jnp.isfinite(q), q, 0)


def _bxpay(x, a, y):
    """x + a*y with per-task scalar a, over field tuples."""
    return tuple(c + a[:, None, None, None] * d for c, d in zip(x, y))


@functools.partial(jax.jit, static_argnames=("first",))
def _bcg_direction(r, rhat, p, v, rho, alpha, omega, first):
    """rho/beta update and new search direction p."""
    rho_new = _bdot(rhat, r)
    if first:
        return r, rho_new
    beta = _guarded_div(rho_new, rho) * _guarded_div(alpha, omega)
    beta = jnp.where(jnp.isfinite(beta), beta, 0)
    p_new = _bxpay(r, beta, _bxpay(p, -omega, v))
    return p_new, rho_new


@jax.jit
def _bcg_alpha(phat, r, rhat, rho, arrs):
    """v = A phat; alpha = rho/<rhat,v>; s = r - alpha v."""
    v = _bamat(phat, arrs)
    alpha = _guarded_div(rho, _bdot(rhat, v))
    svec = _bxpay(r, -alpha, v)
    return v, alpha, svec


@jax.jit
def _bcg_advance(shat, phat, svec, x, alpha, active, arrs):
    """t = A shat; omega; masked x/r updates; new residual norms.

    Converged lanes are frozen by *selection* on the task mask, not by
    zeroing the step: an active-lane breakdown can yield non-finite
    Krylov scalars, and ``0 * NaN`` in a multiplicative gate would
    still overwrite a frozen, already-converged solution with NaN.
    """
    t = _bamat(shat, arrs)
    omega = _guarded_div(_bdot(t, svec), _bdot(t, t))
    x_upd = _bxpay(_bxpay(x, alpha, phat), omega, shat)
    sel = active[:, None, None, None]
    x_new = tuple(jnp.where(sel, u, c) for u, c in zip(x_upd, x))
    r_new = _bxpay(svec, -omega, t)
    return x_new, r_new, omega, _bnorm_dev(r_new)


@jax.jit
def _bamat(e, arrs):
    """Batched operator application (B tasks at once)."""
    def fn(e, a):
        a = _scaled(a)
        return solver.operator.amat_x(
            *e, a["eta_x"], a["eta_y"], a["eta_z"], a["zeta"],
            a["hx"], a["hy"], a["hz"])
    return jax.vmap(fn, in_axes=(0, _axes_of(arrs)))(e, arrs)


def _bprecond(s, var, bhier):
    """Apply ``var.maxit`` batched MG cycles to s from a zero guess.

    Batched mirror of the per-task preconditioner
    (solver.py:mg_precond_dev): split-precision accumulation inside,
    sc/lr direction cycling shared with the outer loop via ``var``.
    Runs a fixed cycle count — per-task early exit would desynchronize
    the batch; the count is the small ``maxcycle`` (e.g. 3) the
    reference also uses as its inner budget.
    """
    e_hi = tuple(jnp.zeros_like(c) for c in s)
    e_lo = e_hi
    r = s
    for cyc in range(var.maxit):
        sc_next = next(var.sc_cycle) if var.sc_cycle else var.sc_dir
        lr_next = next(var.lr_cycle) if var.lr_cycle else var.lr_dir
        meta, arrays = bhier.get(var.sc_dir, var.lr_dir)
        de = _cycle_correction_batched(meta, arrays, r, var, cyc == 0)
        e_hi, e_lo = solver._accumulate_jit(e_hi, e_lo, de)
        var.sc_dir, var.lr_dir = sc_next, lr_next
        var.it += 1
        if cyc + 1 < var.maxit:
            r, _ = _bresidual_norm_split(e_hi, e_lo, s, arrays[0])
    return tuple(h + l for h, l in zip(e_hi, e_lo))


def _bicgstab_batch(s, var, bhier, verb=0, x0=None):
    """Right-preconditioned BiCGSTAB over the task batch.

    Batched counterpart of solver._bicgstab (reference role:
    emg3d/solver.py:759-765).  ``x0`` warm-starts the iteration (the
    initial residual is then s - A x0).  Returns
    (x, rnorm, it, converged_mask).
    """
    arrs0 = bhier.get(var.sc_dir, var.lr_dir)[1][0]

    bnrm = np.asarray(_bnorm_dev(s))
    atol = np.maximum(1e-30, var.tol * np.where(bnrm == 0, 1.0, bnrm))

    if x0 is None:
        x = tuple(jnp.zeros_like(c) for c in s)
        r = s                        # r = s - A·0
        rnorm = bnrm.copy()
    else:
        x = x0
        r = _bxpay(s, -jnp.ones(bnrm.shape, dtype=s[0].dtype),
                   _bamat(x, arrs0))
        rnorm = np.array(_bnorm_dev(r))
    rhat = r
    cdtype = s[0].dtype
    ones = jnp.ones(bnrm.shape, dtype=cdtype)
    rho = alpha = omega = ones
    v = p = tuple(jnp.zeros_like(c) for c in s)

    # Zero-source (or already-converged warm-started) tasks: born done.
    active = (bnrm > 0) & (rnorm >= atol)
    if not active.any():
        return x, rnorm, 0, rnorm < atol

    # Lane bookkeeping for active-shrink: ``cur[lane]`` is the original
    # task index held by device lane ``lane``; dropped (converged)
    # tasks' solutions are stashed on the host at shrink time.
    ntask = active.size
    cur = np.arange(ntask)
    stash = {}
    spec = None
    nd = 1
    if getattr(bhier, "mesh", None) is not None:
        nd = bhier.mesh.devices.size
        spec = NamedSharding(bhier.mesh, PartitionSpec(bhier.axis))
    shrink = _shrink_on()

    it = 0
    for it in range(1, var.ssl_maxit + 1):
        p, rho = _bcg_direction(r, rhat, p, v, rho, alpha, omega,
                                first=it == 1)
        phat = _bprecond(p, var, bhier) if var.cycle else p
        v, alpha, svec = _bcg_alpha(phat, r, rhat, rho, arrs0)
        shat = _bprecond(svec, var, bhier) if var.cycle else svec
        x, r, omega, rnorm_dev = _bcg_advance(
            shat, phat, svec, x, alpha, jnp.asarray(active[cur]), arrs0)

        rnorm[cur] = np.where(active[cur], np.asarray(rnorm_dev),
                              rnorm[cur])
        active = active & (rnorm >= atol)
        var.ssl_it += 1
        if verb > 3:
            rel = rnorm / np.where(bnrm == 0, 1.0, bnrm)
            print(f"   ssl it {it:3}: max rel error {rel.max():.3e} "
                  f"({(~active).sum()}/{active.size} converged)")
        if not active.any():
            break

        if shrink:
            new_n = _shrink_size(cur.size, int(active[cur].sum()), nd)
            if new_n < cur.size:
                keep = _keep_lanes(active[cur], new_n)
                drop = np.setdiff1d(np.arange(cur.size), keep)
                xh = [np.asarray(c) for c in x]
                for lane in drop:
                    stash[int(cur[lane])] = tuple(c[lane] for c in xh)
                x, r, rhat, v, p = (
                    _take_fields(f, keep, spec)
                    for f in (x, r, rhat, v, p))
                kidx = jnp.asarray(keep)
                rho, alpha, omega = (jnp.take(c, kidx, axis=0)
                                     for c in (rho, alpha, omega))
                bhier = _SelectedHierarchies(bhier, keep, spec)
                arrs0 = _take_level(arrs0, keep, spec)
                cur = cur[keep]
                if verb > 3:
                    print(f"   ssl it {it:3}: batch shrunk to "
                          f"{cur.size}/{ntask} lanes")

    if cur.size != ntask:
        xh = [np.asarray(c) for c in x]
        full = [np.zeros((ntask,) + c.shape[1:], c.dtype) for c in xh]
        for lane, oi in enumerate(cur):
            for j in range(3):
                full[j][oi] = xh[j][lane]
        for oi, triple in stash.items():
            for j in range(3):
                full[j][oi] = triple[j]
        x = tuple(full)

    return x, rnorm, it, rnorm < atol


def _build_hierarchy_batched(vmodels, sc_dir, lr_dir, clevel_max, mesh=None,
                             axis="task", scales=None):
    """Batched hierarchy in one of two layouts.

    With ``scales`` (the shared-eta fast path): ONE hierarchy is built
    (eta stored once per level, replicated) plus a per-task complex
    ``eta_scale`` vector sharded over the mesh — task k's eta is
    exactly ``scales[k] * eta`` (eta is linear in s when epsilon_r is
    absent, and model restriction is linear), so HBM holds O(cells)
    instead of O(B * cells) model data.

    Without ``scales``: per-task hierarchies are built and eta is
    stacked on a leading task axis (general case, e.g. epsilon_r).
    """
    spec_b = None
    if mesh is not None:
        spec_b = NamedSharding(mesh, PartitionSpec(axis))

    if scales is not None:
        meta, arrays = solver._build_hierarchy(
            vmodels[0], sc_dir, lr_dir, clevel_max)
        sc128 = np.asarray(scales, dtype=np.complex128)
        levels = []
        for lvl_arrs in arrays:
            out = dict(lvl_arrs)
            if "eta_x_lo" in out:
                # f32 level with df64 companions: the scale itself is
                # split so _scaled can rescale the lo-parts exactly.
                sc, sc_lo = df64.split_f64(sc128, np.float32)
                sc, sc_lo = jnp.asarray(sc), jnp.asarray(sc_lo)
                if spec_b is not None:
                    sc = jax.device_put(sc, spec_b)
                    sc_lo = jax.device_put(sc_lo, spec_b)
                out["eta_scale_lo"] = sc_lo
            else:
                sc = jnp.asarray(sc128).astype(out["eta_x"].dtype)
                if spec_b is not None:
                    sc = jax.device_put(sc, spec_b)
            out["eta_scale"] = sc
            levels.append(out)
        return meta, levels

    metas, per_task = [], []
    for vm in vmodels:
        meta, arrays = solver._build_hierarchy(vm, sc_dir, lr_dir,
                                               clevel_max)
        metas.append(meta)
        per_task.append(arrays)
    if any(m != metas[0] for m in metas[1:]):
        raise ValueError("All tasks must share the same grid hierarchy.")

    def _put(arr):
        return jax.device_put(arr, spec_b) if spec_b is not None else arr

    stacked = []
    for lvl in range(len(metas[0])):
        out = dict(per_task[0][lvl])
        for k in out:
            if not k.startswith("eta_"):
                continue
            out[k] = _put(jnp.stack([pt[lvl][k] for pt in per_task]))
        # Pre-blocked smoother operands: stack the eta block-tuples on
        # a leading task axis too (same O(B*cells) class as the eta
        # stacking above; zeta blocks are frequency-independent and
        # stay shared).  _axes_of maps them with in_axes (0, 0, 0,
        # None) so the vmapped smoother sees per-task 3-D sub-blocks.
        def _stack_eta_blocks(packed_of, lvl=lvl):
            packs = [packed_of(pt[lvl]) for pt in per_task]
            return tuple(
                tuple(_put(jnp.stack([p[i][b] for p in packs]))
                      for b in range(len(packs[0][i])))
                for i in range(3)) + (packed_of(per_task[0][lvl])[3],)

        if "blk" in out:
            out["blk"] = _stack_eta_blocks(lambda a: a["blk"])
        if "blk_t" in out:
            out["blk_t"] = {
                ax: _stack_eta_blocks(lambda a, ax=ax: a["blk_t"][ax])
                for ax in out["blk_t"]}
        stacked.append(out)
    return metas[0], stacked


def solve_batch(model, sources, frequencies, mesh=None, axis="task",
                verb=0, **kwargs):
    """Solve one model for many (source, frequency) tasks at once.

    Parameters
    ----------
    model : Model
        Resistivity model (shared grid for all tasks).
    sources : list
        Source definitions (coordinate tuples or electrode instances),
        one per task.
    frequencies : list of float
        One frequency per task (same length as ``sources``).
    mesh : jax.sharding.Mesh, optional
        Device mesh; the task axis is sharded over its ``axis``.  The
        batch is padded up to a multiple of the mesh size.
    kwargs
        Solver options as for solve(): tol, maxit, cycle, sslsolver,
        semicoarsening, linerelaxation, nu_*, clevel; plus optional
        ``efields`` (warm-start guesses).  Defaults are plain
        multigrid cycles; ``sslsolver=True`` runs the production
        configuration (batched MG-preconditioned BiCGSTAB; 'cgs' and
        'gcrotmk' have no batched form).

    Returns
    -------
    efields : list of Field
    info : dict
        Per-task iteration counts, errors, and exit messages.
    """
    if len(frequencies) != len(sources):
        raise ValueError("sources and frequencies must have equal length.")
    sfields = [fields.get_source_field(model.grid, src, freq)
               for src, freq in zip(sources, frequencies)]
    return solve_batch_fields(model, sfields, mesh=mesh, axis=axis,
                              verb=verb, **kwargs)


def solve_batch_fields(model, sfields, mesh=None, axis="task", verb=0,
                       efields=None, **kwargs):
    """Batched solve for prebuilt source fields (one per task).

    Engine behind :func:`solve_batch`; also the batch-mode carrier of
    the Simulation's adjoint (residual source fields, ``_bcompute``)
    and sensitivity (``jvec``) solves, whose right-hand sides are
    arbitrary fields rather than dipole sources — the reference
    parallelizes those through the same process pool as the forward
    fields (emg3d/simulations.py:1193-1233, 1270-1397).

    ``efields`` (list of Field or None, per task) warm-starts each
    task; already-converged guesses terminate with zero iterations.
    """
    import time

    t0 = time.perf_counter()
    nsrc = len(sfields)

    kwargs.setdefault("sslsolver", False)
    kwargs.setdefault("semicoarsening", False)
    kwargs.setdefault("linerelaxation", False)
    var = solver.MGParameters(
        shape_cells=model.shape, verb=verb, **kwargs)
    if var.sslsolver and var.sslsolver != 'bicgstab':
        raise ValueError(
            f"sslsolver='{var.sslsolver}' has no batched form; use "
            "'bicgstab' (or parallel='task').")

    sfields = list(sfields)
    guesses = list(efields) if efields is not None else None
    if guesses is not None and not any(g is not None for g in guesses):
        guesses = None

    # Shared-eta fast path: all tasks see the SAME model, and without
    # epsilon_r eta is linear in s — task k's eta is (s_k/s_0) times
    # task 0's, at every hierarchy level (restriction is linear).  One
    # eta copy + a (B,) scale vector then replaces the stacked etas.
    if model.epsilon_r is None:
        vmodels = [models.VolumeModel(model, sfields[0])]
        scales = [sf.smu0 / sfields[0].smu0 for sf in sfields]
    else:
        vmodels = [models.VolumeModel(model, sf) for sf in sfields]
        scales = None

    # Pad the batch to a multiple of the mesh size.
    ntask = nsrc
    if mesh is not None:
        nd = mesh.devices.size
        pad = (-ntask) % nd
        for _ in range(pad):
            sfields.append(sfields[-1])
            if guesses is not None:
                guesses.append(guesses[-1])
            if scales is None:
                vmodels.append(vmodels[-1])
            else:
                scales.append(scales[-1])
        ntask += pad

    bhier = _BatchHierarchies(vmodels, var, mesh=mesh, axis=axis,
                              scales=scales)

    s = tuple(jnp.stack(c) for c in zip(
        *[solver._field_to_dev(sf) for sf in sfields]))
    if mesh is not None:
        spec = NamedSharding(mesh, PartitionSpec(axis))
        s = tuple(jax.device_put(c, spec) for c in s)

    # Warm-start stack: per-task initial guesses (zeros where absent).
    x0 = None
    if guesses is not None:
        def dev_or_zero(g, like):
            if g is None:
                return tuple(np.zeros(c.shape, dtype=c.dtype)
                             for c in like)
            return solver._field_to_dev(g)

        like = solver._field_to_dev(sfields[0])
        x0 = tuple(jnp.stack(c) for c in zip(
            *[dev_or_zero(g, like) for g in guesses]))
        if mesh is not None:
            x0 = tuple(jax.device_put(c, spec) for c in x0)

    l2_refe = np.array([np.linalg.norm(sf.field) for sf in sfields])
    l2_refe = np.where(l2_refe == 0.0, 1.0, l2_refe)

    if var.sslsolver:
        x, l2, it_ssl, conv = _bicgstab_batch(s, var, bhier, verb=verb,
                                              x0=x0)
        exit_messages = ["CONVERGED" if c else
                         "MAX. ITERATION REACHED, NOT CONVERGED"
                         for c in conv]
        it_mg, it_ssl = var.it, it_ssl
        parts = x
    else:
        e_hi = (x0 if x0 is not None
                else tuple(jnp.zeros_like(c) for c in s))
        e_lo = tuple(jnp.zeros_like(c) for c in s)
        dt = sfields[0].field.dtype

        # Active-shrink bookkeeping (see _shrink_size): ``cur[lane]``
        # is the original task index on device lane ``lane``;
        # recompacted-away (finished) tasks' combined fields and exit
        # messages are stashed on the host.
        cur = np.arange(ntask)
        stash = {}
        l2_full = np.zeros(ntask)
        exit_full = ["MAX. ITERATION REACHED, NOT CONVERGED"] * ntask
        shrink = _shrink_on()
        spec = None
        nd = 1
        if mesh is not None:
            nd = mesh.devices.size
            spec = NamedSharding(mesh, PartitionSpec(axis))

        it = 0
        first = True
        while True:
            meta, arrays = bhier.get(var.sc_dir, var.lr_dir)
            r, l2_dev = _bresidual_norm_split(e_hi, e_lo, s, arrays[0])
            l2 = np.asarray(l2_dev)
            l2_full[cur] = l2

            rel = l2 / l2_refe[cur]
            done = rel < var.tol
            diverged = ~np.isfinite(l2) | (l2 > 10 * l2_refe[cur])
            if verb > 3 and it > 0:
                print(f"   cycle {it:3}: max rel error {rel.max():.3e} "
                      f"({done.sum() + len(stash)}/{ntask} converged)")
            finished = done | diverged
            if np.all(finished) or it >= var.maxit:
                for lane, oi in enumerate(cur):
                    exit_full[oi] = (
                        "CONVERGED" if done[lane] else
                        "DIVERGED" if diverged[lane] else
                        "MAX. ITERATION REACHED, NOT CONVERGED")
                break

            if shrink:
                new_n = _shrink_size(cur.size, int((~finished).sum()),
                                     nd)
                if new_n < cur.size:
                    keep = _keep_lanes(~finished, new_n)
                    drop = np.setdiff1d(np.arange(cur.size), keep)
                    eh = [np.asarray(c) for c in e_hi]
                    el = [np.asarray(c) for c in e_lo]
                    for lane in drop:
                        stash[int(cur[lane])] = tuple(
                            np.asarray(h[lane], dtype=dt)
                            + np.asarray(l[lane], dtype=dt)
                            for h, l in zip(eh, el))
                        exit_full[int(cur[lane])] = (
                            "CONVERGED" if done[lane] else "DIVERGED")
                    e_hi, e_lo, s, r = (
                        _take_fields(f, keep, spec)
                        for f in (e_hi, e_lo, s, r))
                    bhier = _SelectedHierarchies(bhier, keep, spec)
                    meta, arrays = bhier.get(var.sc_dir, var.lr_dir)
                    cur = cur[keep]
                    if verb > 3:
                        print(f"   cycle {it:3}: batch shrunk to "
                              f"{cur.size}/{ntask} lanes")

            sc_next = (next(var.sc_cycle) if var.sc_cycle
                       else var.sc_dir)
            lr_next = (next(var.lr_cycle) if var.lr_cycle
                       else var.lr_dir)
            de = _cycle_correction_batched(meta, arrays, r, var, first)
            first = False
            e_hi, e_lo = solver._accumulate_jit(e_hi, e_lo, de)
            var.sc_dir, var.lr_dir = sc_next, lr_next
            it += 1

        it_mg, it_ssl = it, 0
        l2, exit_messages = l2_full, exit_full
        # Combine the split field in the host dtype so the algebraic
        # accuracy survives the export.
        parts = tuple(
            np.asarray(h, dtype=dt) + np.asarray(l, dtype=dt)
            for h, l in zip(e_hi, e_lo))
        if cur.size != ntask:
            full = [np.zeros((ntask,) + c.shape[1:], c.dtype)
                    for c in parts]
            for lane, oi in enumerate(cur):
                for j in range(3):
                    full[j][oi] = parts[j][lane]
            for oi, triple in stash.items():
                for j in range(3):
                    full[j][oi] = triple[j]
            parts = tuple(full)

    # Unstack into Fields (drop padding).
    efields = []
    ex, ey, ez = (np.asarray(c) for c in parts)
    for i in range(nsrc):
        f = fields.Field(model.grid, dtype=sfields[i].field.dtype,
                         frequency=sfields[i]._frequency)
        f.fx, f.fy, f.fz = ex[i], ey[i], ez[i]
        efields.append(f)

    info = {
        "it_mg": it_mg,
        "it_ssl": it_ssl,
        "abs_error": l2[:nsrc],
        "rel_error": (l2 / l2_refe)[:nsrc],
        "ref_error": l2_refe[:nsrc],
        "exit_messages": exit_messages[:nsrc],
        "tol": var.tol,
        # Wall-clock of the whole batch (tasks run fused, there is no
        # meaningful per-task split).
        "runtime": round(time.perf_counter() - t0, 3),
    }
    return efields, info
