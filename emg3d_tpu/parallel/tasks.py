"""Per-(source, frequency) task execution for Simulation.

The reference fans survey tasks out to a ``ProcessPoolExecutor``
(emg3d/_multiprocessing.py:33-69), pickling one dict per task.  On TPU
the device is the compute resource, not host processes: tasks run as a
host-driven loop over the jitted device solver (sequential dispatch, all
data resident on device; multigrid hierarchies and compiled kernels are
shared between tasks), or — when all tasks share a grid — as one batched,
device-mesh-sharded solve (emg3d_tpu.parallel.batch).

``process_map``/``solve`` keep the reference's worker contract
(_multiprocessing.py:33-153) so the Simulation layer and file-based
(h5-spill) computations behave identically.
"""

from emg3d_tpu import io, solver

__all__ = ['process_map', 'solve']


def process_map(fn, fn_inputs, max_workers=4, **kwargs):
    """Apply fn to each input; returns the list of results.

    Drop-in for the reference's process_map (_multiprocessing.py:33-69).
    ``max_workers`` is accepted for API parity but tasks are dispatched
    sequentially to the accelerator: device kernels already use the whole
    chip, so host-side process/thread pools only add pickle overhead.
    An optional tqdm progress bar mirrors the reference's UX.
    """
    process_map.count += 1

    tqdm_opts = {k: kwargs[k] for k in ('desc', 'bar_format', 'disable')
                 if k in kwargs}

    try:
        from tqdm.auto import tqdm
        iterator = tqdm(fn_inputs, **tqdm_opts)
    except ImportError:
        iterator = fn_inputs

    return [fn(inp) for inp in iterator]


process_map.count = 0


def solve(inp):
    """Solve one task; mirrors the reference worker contract.

    ``inp`` is a dict with keys [model, sfield, efield, solver_opts]
    (forwarded to solve) or [model, grid, source, frequency, efield,
    solver_opts] (forwarded to solve_source), or the path of an h5 file
    holding such a dict under 'data' (file-based computation,
    reference _multiprocessing.py:112-116).  The model is interpolated
    to the task grid.  Always returns (efield, info).
    """
    fname = False
    if isinstance(inp, str):
        fname = inp.rsplit('.', 1)[0] + '_out.' + inp.rsplit('.', 1)[1]
        inp = io.load(inp, verb=0)['data']

    if 'sfield' in inp.keys():
        solver_input = {**inp['solver_opts'], 'sfield': inp['sfield']}
        inp['grid'] = inp['sfield'].grid
        fct = solver.solve
    else:
        solver_input = {**inp['solver_opts'], 'source': inp['source'],
                        'frequency': inp['frequency']}
        fct = solver.solve_source

    model = inp['model'].interpolate_to_grid(inp['grid'])

    solver_input['model'] = model
    solver_input['efield'] = inp['efield']
    solver_input['return_info'] = True
    solver_input['always_return'] = True

    efield, info = fct(**solver_input)
    if fname:
        io.save(fname, efield=efield, info=info, verb=0)
        return fname, fname
    return efield, info


def layered(inp):
    """Layered (1-D) responses or FD gradient for one source.

    Native mirror of the reference's empymod worker
    (emg3d/_multiprocessing.py:156-463), built on the bundled layered
    engine (:mod:`emg3d_tpu.layered`).  Input dict keys: model, src,
    receivers, frequencies, observed, layered_opts, gradient
    (+ weights/residual when gradient=True).

    Returns (nrec, nfreq) responses, or a (3, nx, ny, nz) gradient.
    """
    import numpy as np
    from copy import deepcopy

    model = inp['model']
    src = inp['src']
    receivers = inp['receivers']
    frequencies = np.array([f for f in inp['frequencies'].values()])
    observed = inp['observed']
    lopts = deepcopy(inp['layered_opts'])
    gradient = inp['gradient']

    method = lopts.pop('method', 'midpoint')
    lopts['return_imat'] = True

    vti = model.case == 'VTI'
    if model.case in ('HTI', 'triaxial'):
        raise NotImplementedError(
            "Layered computation is implemented for isotropic and VTI "
            "models (as the reference).")

    if gradient:
        out = np.zeros((3, *model.shape))
        weights = inp.get('weights', None)
        residual = inp.get('residual', None)
        if weights is None or residual is None or observed is None:
            return out
    else:
        out = np.full((len(receivers), frequencies.size),
                      np.nan + 1j * np.nan)

    # observed/weights/residual are plain (nrec, nfreq) ndarrays (or
    # None), indexed positionally in receiver-dict order.
    for i, (rkey, rec) in enumerate(receivers.items()):
        if observed is not None:
            fi = np.isfinite(np.asarray(observed[i]))
            if fi.sum() == 0:
                continue
            freqs = frequencies[fi]
        else:
            fi = np.ones(frequencies.size, dtype=bool)
            freqs = frequencies

        oned, imat = model.extract_1d(
            **_get_points(method, src, rec), **lopts)

        map2cond = oned.map.backward
        cond_h = map2cond(oned.property_x[0, 0, :])
        cond_v = None if not vti else map2cond(oned.property_z[0, 0, :])

        fwd_inp = {
            'src': src,
            'rec': rec,
            'depth': oned.grid.nodes_z[1:-1],
            'freqs': freqs,
        }

        if gradient:
            obs = np.asarray(observed[i])[fi]
            wgt = np.asarray(weights[i])[fi]
            res = np.asarray(residual[i])[fi]
            misfit = np.sum(wgt * (res.conj() * res)).real / 2

            out[0, ...] += _fd_gradient(cond_h, cond_v, obs, wgt, misfit,
                                        fwd_inp, imat, vertical=False)
            if vti:
                out[2, ...] += _fd_gradient(cond_h, cond_v, obs, wgt,
                                            misfit, fwd_inp, imat,
                                            vertical=True)
        else:
            out[i, fi] = _layered_fwd(cond_h, cond_v, fwd_inp)

    return out


def _layered_fwd(cond_h, cond_v, fwd_inp):
    """Responses of one src-rec pair over frequencies (native engine)."""
    import numpy as np
    from emg3d_tpu import layered as _layered

    src = fwd_inp['src']
    rec = fwd_inp['rec']
    aniso = None if cond_v is None else np.sqrt(cond_h / cond_v)

    src_pt = (*src.center, src.azimuth, src.elevation)
    rec_pt = np.atleast_2d([*rec.center, rec.azimuth, rec.elevation])
    rec_type = rec.xtype

    out = np.empty(len(fwd_inp['freqs']), dtype=np.complex128)
    for i, freq in enumerate(fwd_inp['freqs']):
        resp = _layered.dipole_layered(
            src_pt, rec_pt, fwd_inp['depth'], 1.0 / cond_h, freq,
            aniso=aniso, rec_type=rec_type)
        out[i] = resp[0] * src.strength
    return out


def _get_points(method, src, rec):
    """Method/p0/p1 for Model.extract_1d (ref _multiprocessing.py:356)."""
    p0 = src.center[:2]
    p1 = rec.center[:2]
    if method == 'source':
        p1 = p0
        method = 'midpoint'
    elif method == 'receiver':
        p0 = p1
        method = 'midpoint'
    return {'method': method, 'p0': p0, 'p1': p1}


def _fd_gradient(cond_h, cond_v, data, weight, misfit, fwd_inp, imat,
                 vertical):
    """Layer-wise finite-difference gradient (0.01 % perturbation).

    Reference: emg3d/_multiprocessing.py:395-463.
    """
    import numpy as np

    rel_diff = 0.0001
    grad = np.zeros(cond_h.size)
    for iz in range(cond_h.size):
        cond_p = cond_h.copy() if not vertical else cond_v.copy()
        delta = cond_p[iz] * rel_diff
        cond_p[iz] += delta

        if vertical:
            response = _layered_fwd(cond_h, cond_p, fwd_inp)
        else:
            response = _layered_fwd(cond_p, cond_v, fwd_inp)

        residual = response - data
        fd_misfit = np.sum(weight * (residual.conj() * residual)).real / 2
        grad[iz] = (fd_misfit - misfit) / delta

    return imat[..., None] * grad[None, :]
