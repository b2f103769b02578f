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
