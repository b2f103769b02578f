"""Batched multi-(source, frequency) solves over a device mesh.

The reference parallelizes a survey by pickling one task per
(source, frequency) to a process pool (emg3d/_multiprocessing.py:33-69,
emg3d/simulations.py:860-866).  Here the tasks become a leading batch
axis: model parameters that depend on frequency (eta) and the source
fields are stacked, every multigrid operation is ``jax.vmap``-ed over
that axis, and the axis is sharded over the devices of a
``jax.sharding.Mesh`` — XLA partitions the batch with zero collectives.

All tasks must share the grid (the Simulation layer interpolates to a
common grid for its 'same' gridding mode; per-task grids fall back to a
sequential loop there).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from emg3d_tpu import fields, models, solver

__all__ = ["solve_batch", "make_task_mesh"]


def make_task_mesh(n_devices=None, axis="task"):
    """A 1-D device mesh over (the first ``n_devices``) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _axes_of(arrs):
    """vmap in_axes for a level's array dict: eta_* batched, rest shared."""
    return {k: (0 if k.startswith("eta_") else None) for k in arrs}


@functools.partial(jax.jit, static_argnames=("c_lr_dir", "nu"))
def _bsmooth(e, s, arrs, c_lr_dir, nu):
    fn = functools.partial(solver._smooth_dev, c_lr_dir=c_lr_dir, nu=nu)
    return jax.vmap(fn, in_axes=(0, 0, _axes_of(arrs)))(e, s, arrs)


@functools.partial(jax.jit, static_argnames=("coarsen",))
def _brestrict(e, s, arrs, coarsen):
    def fn(e, s, arrs):
        res = solver._residual_dev(e, s, arrs)
        from emg3d_tpu.ops import transfer
        return transfer.restrict(*res, arrs["rw"], coarsen)
    return jax.vmap(fn, in_axes=(0, 0, _axes_of(arrs)))(e, s, arrs)


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
        return operator.residual_norm(*solver._residual_dev(e, s, arrs))
    return jax.vmap(fn, in_axes=(0, 0, _axes_of(arrs)))(e, s, arrs)


@jax.jit
def _bresidual_norm_split(e_hi, e_lo, s, arrs):
    """Batched split-field residual + per-task norms (B,)."""
    from emg3d_tpu.ops import operator

    def fn(eh, el, s_, a):
        if eh[0].dtype in (jnp.complex64, jnp.float32):
            from emg3d_tpu.ops import df64
            return df64.residual_norm_split_df64(eh, el, s_, a)
        r_hi = solver._residual_dev(eh, s_, a)
        a_lo = operator.amat_x(
            *el, a["eta_x"], a["eta_y"], a["eta_z"], a["zeta"],
            a["hx"], a["hy"], a["hz"])
        r = tuple(h - l for h, l in zip(r_hi, a_lo))
        return r, operator.residual_norm(*r)

    return jax.vmap(fn, in_axes=(0, 0, 0, _axes_of(arrs)))(
        e_hi, e_lo, s, arrs)


def _cycle_correction_batched(meta, arrays, r, var, first):
    """Defect-correction cycle for the whole batch (vmapped level ops)."""
    return solver._cycle_correction(
        meta, arrays, r, var, first, smooth=_bsmooth, restrict=_brestrict,
        prolong=_bprolong)


def _build_hierarchy_batched(vmodels, sc_dir, lr_dir, clevel_max, mesh=None,
                             axis="task"):
    """Stack per-task hierarchies (eta batched; zeta/h/weights shared)."""
    metas, per_task = [], []
    for vm in vmodels:
        meta, arrays = solver._build_hierarchy(vm, sc_dir, lr_dir,
                                               clevel_max)
        metas.append(meta)
        per_task.append(arrays)
    if any(m != metas[0] for m in metas[1:]):
        raise ValueError("All tasks must share the same grid hierarchy.")

    spec_b = None
    if mesh is not None:
        spec_b = NamedSharding(mesh, PartitionSpec(axis))

    stacked = []
    for lvl in range(len(metas[0])):
        out = dict(per_task[0][lvl])
        for k in out:
            if not k.startswith("eta_"):
                continue
            arr = jnp.stack([pt[lvl][k] for pt in per_task])
            if spec_b is not None:
                arr = jax.device_put(arr, spec_b)
            out[k] = arr
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
        Multigrid options (tol, maxit, cycle, semicoarsening,
        linerelaxation, nu_*); the batched path runs plain multigrid
        cycles (no outer Krylov).

    Returns
    -------
    efields : list of Field
    info : dict
        Per-task iteration counts, errors, and exit messages.
    """
    nsrc = len(sources)
    if len(frequencies) != nsrc:
        raise ValueError("sources and frequencies must have equal length.")

    kwargs.setdefault("sslsolver", False)
    kwargs.setdefault("semicoarsening", False)
    kwargs.setdefault("linerelaxation", False)
    var = solver.MGParameters(
        shape_cells=model.shape, verb=verb, **kwargs)

    # Build per-task source fields and volume models (host, setup time).
    sfields = [fields.get_source_field(model.grid, src, freq)
               for src, freq in zip(sources, frequencies)]
    vmodels = [models.VolumeModel(model, sf) for sf in sfields]

    # Pad the batch to a multiple of the mesh size.
    ntask = nsrc
    if mesh is not None:
        nd = mesh.devices.size
        pad = (-ntask) % nd
        for _ in range(pad):
            sfields.append(sfields[-1])
            vmodels.append(vmodels[-1])
        ntask += pad

    meta, arrays = _build_hierarchy_batched(
        vmodels, var.sc_dir, var.lr_dir, var.clevel[min(var.sc_dir, 3)],
        mesh=mesh, axis=axis)

    s = tuple(jnp.stack(c) for c in zip(
        *[solver._field_to_dev(sf) for sf in sfields]))
    if mesh is not None:
        spec = NamedSharding(mesh, PartitionSpec(axis))
        s = tuple(jax.device_put(c, spec) for c in s)
    e_hi = tuple(jnp.zeros_like(c) for c in s)
    e_lo = e_hi

    l2_refe = np.array([np.linalg.norm(sf.field) for sf in sfields])
    l2_refe = np.where(l2_refe == 0.0, 1.0, l2_refe)

    it = 0
    first = True
    exit_messages = ["MAX. ITERATION REACHED, NOT CONVERGED"] * ntask
    while True:
        r, l2_dev = _bresidual_norm_split(e_hi, e_lo, s, arrays[0])
        l2 = np.asarray(l2_dev)

        rel = l2 / l2_refe
        done = rel < var.tol
        diverged = ~np.isfinite(l2) | (l2 > 10 * l2_refe)
        if verb > 3 and it > 0:
            print(f"   cycle {it:3}: max rel error {rel.max():.3e} "
                  f"({done.sum()}/{ntask} converged)")
        if np.all(done):
            exit_messages = ["CONVERGED"] * ntask
            break
        if np.all(done | diverged):
            exit_messages = ["CONVERGED" if d else "DIVERGED"
                             for d in done]
            break
        if it >= var.maxit:
            exit_messages = ["CONVERGED" if d else
                             "MAX. ITERATION REACHED, NOT CONVERGED"
                             for d in done]
            break

        de = _cycle_correction_batched(meta, arrays, r, var, first)
        first = False
        e_hi, e_lo = solver._accumulate_jit(e_hi, e_lo, de)
        it += 1

    # Unstack into Fields (drop padding); combine the split field in the
    # host dtype so the algebraic accuracy survives the export.
    efields = []
    dt = sfields[0].field.dtype
    ex, ey, ez = (np.asarray(h, dtype=dt) + np.asarray(l, dtype=dt)
                  for h, l in zip(e_hi, e_lo))
    for i in range(nsrc):
        f = fields.Field(model.grid, dtype=sfields[i].field.dtype,
                         frequency=sfields[i]._frequency)
        f.fx, f.fy, f.fz = ex[i], ey[i], ez[i]
        efields.append(f)

    info = {
        "it_mg": it,
        "abs_error": l2[:nsrc],
        "rel_error": (l2 / l2_refe)[:nsrc],
        "ref_error": l2_refe[:nsrc],
        "exit_messages": exit_messages[:nsrc],
        "tol": var.tol,
    }
    return efields, info
