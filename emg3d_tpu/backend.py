"""Remote-accelerator health probing and failure-window retries.

Tunneled TPU backends (device servers reached over a network link)
exhibit *failure windows*: multi-minute periods during which some
device-service RPCs fail with ``UNIMPLEMENTED``/``UNAVAILABLE`` while
the service is otherwise up.  Empirically (measured on the axon
tunnel):

- device *compute* keeps succeeding during a window (enqueue + execute
  of compiled programs, including complex arithmetic);
- device-to-host *transfers* (literal reads: ``float(x)``,
  ``np.asarray(x)``) fail for the whole window, then recover;
- device arrays and loaded executables survive the window intact;
- in-process "resets" (``jax.clear_caches``,
  ``jax.extend.backend.clear_backends``) do NOT shorten the window, and
  fresh processes started inside a window are born failing — the only
  winning move is to wait.

The reference (emsig/emg3d) runs on local CPUs and never faces this;
it has no analogous subsystem.  Everything here is therefore TPU-native
infrastructure: a cheap health probe, a bounded wait-until-healthy
loop, and a retry wrapper used by every host-driven device loop in
:mod:`emg3d_tpu.solver` (the per-cycle residual-norm sync is a
device-to-host read and is exactly what a window breaks mid-solve).

Two distinct failure modes were measured, needing different remedies:

1. *Born-bad processes*: the health of a process's device channel is
   decided when it first connects — a process that starts unhealthy
   never recovers (hours of probes, cache clears and
   ``clear_backends`` re-dials never helped), while a process that
   starts healthy has never been observed to degrade.  The fraction
   of bad births varies over time (0/12 in one period, 11/12 in
   another), consistent with a load-balanced backend pool with
   changing membership of broken members.  Remedy: re-execute the
   process (:func:`reexec_if_born_bad`) — each fresh process rolls a
   new connection.
2. *Service blips* inside a healthy process (rare): short transient
   RPC failures.  Remedy: :func:`retry_transient` waits and retries
   against the still-valid device state.

Environment knobs:

- ``EMG3D_TPU_MAX_WAIT`` (seconds, default 2700): total time a single
  device step may spend waiting out failure windows before the error
  is re-raised.
- ``EMG3D_TPU_PROBE_INTERVAL`` (seconds, default 20): health-probe
  cadence while waiting.
- ``EMG3D_TPU_REEXEC`` (default 40): maximum process re-executions
  for :func:`reexec_if_born_bad`.
- ``EMG3D_TPU_REEXEC_BUDGET_S`` (seconds, default unbounded): total
  wall-clock the rebirth loop may consume across all re-executions;
  when exhausted :func:`reexec_if_born_bad` raises
  :class:`HealthError` so the caller can fall back (e.g. bench.py's
  tagged CPU measurement) instead of eating a driver's whole budget.
"""

import os
import time
import warnings

import numpy as np

__all__ = [
    "is_transient", "probe", "probe_timed", "wait_healthy",
    "retry_transient", "reexec_if_born_bad",
    "enable_compilation_cache", "tune_host_malloc", "HealthError",
]

# Set to True by the first successful probe: distinguishes a service
# blip inside a healthy process (wait-and-retry works) from a born-bad
# process (only a process restart helps).
_was_healthy = False


def __dir__():
    return __all__


_TRANSIENT_MARKERS = (
    "UNIMPLEMENTED", "INTERNAL", "UNAVAILABLE", "DEADLINE_EXCEEDED",
    "ABORTED", "UNKNOWN: ",
)


class HealthError(RuntimeError):
    """The backend did not recover within the wait budget."""


def is_transient(exc):
    """Whether ``exc`` looks like a recoverable backend-service failure."""
    msg = str(exc)
    return any(m in msg for m in _TRANSIENT_MARKERS)


def probe():
    """Cheap end-to-end health check: compute + device-to-host read.

    Covers the two RPC classes that fail independently during windows.
    Returns True iff a tiny complex reduction executes AND its value
    reads back correctly.
    """
    import jax.numpy as jnp

    global _was_healthy
    try:
        x = jnp.arange(8.0) + 1j
        val = complex(jnp.sum(x * x))           # execute + D2H literal
        ref = complex(np.sum((np.arange(8.0) + 1j) ** 2))
        ok = abs(val - ref) < 1e-3
        _was_healthy = _was_healthy or ok
        return ok
    except Exception:
        return False


def probe_timed(timeout_s=120.0):
    """:func:`probe` with a hard wall-clock bound.

    A bad channel can HANG a device RPC indefinitely rather than fail
    it (observed on the axon tunnel: the D2H literal read in probe()
    blocking > 15 min).  The probe runs in a daemon thread; if it does
    not return within ``timeout_s`` the channel is reported unhealthy.
    The hung thread is abandoned — callers react by re-executing or
    falling back, so nothing waits on it.
    """
    import threading

    result = []
    t = threading.Thread(target=lambda: result.append(probe()),
                         daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(result and result[0])


def _max_wait():
    return float(os.environ.get("EMG3D_TPU_MAX_WAIT", "2700"))


def _interval():
    return float(os.environ.get("EMG3D_TPU_PROBE_INTERVAL", "20"))


def wait_healthy(what="device step", budget=None):
    """Block until :func:`probe` passes; return seconds waited.

    Raises :class:`HealthError` if the backend stays unhealthy for the
    whole budget (default ``EMG3D_TPU_MAX_WAIT``).
    """
    budget = _max_wait() if budget is None else budget
    interval = _interval()
    t0 = time.monotonic()
    warned = False
    fails = 0
    while True:
        # Time-bounded: a bad channel can hang an RPC, not just fail
        # it — an unbounded probe would block the whole wait loop.
        if probe_timed(max(3 * interval, 60.0)):
            waited = time.monotonic() - t0
            if warned:
                warnings.warn(
                    f"emg3d-tpu: backend healthy again after "
                    f"{waited:.0f}s ({what}).", RuntimeWarning)
            return waited
        fails += 1
        waited = time.monotonic() - t0
        if not _was_healthy and fails >= 3:
            # Born-bad process: this channel will never recover;
            # waiting further only burns the budget.
            raise HealthError(
                f"backend channel unhealthy since process start "
                f"({fails} probes) during {what}; restart the process "
                f"for a fresh connection (see backend.reexec_if_born_bad)")
        if waited >= budget:
            raise HealthError(
                f"backend unhealthy for {waited:.0f}s (> {budget:.0f}s "
                f"budget) during {what}")
        if not warned:
            warnings.warn(
                f"emg3d-tpu: backend failure window detected during "
                f"{what}; waiting it out (probe every {interval:.0f}s, "
                f"budget {budget:.0f}s).", RuntimeWarning)
            warned = True
        time.sleep(interval)


def reexec_if_born_bad(argv=None, sleep=None):
    """Re-execute the current process until it starts healthy.

    Call early in a TPU-driving script (before building device state).
    If the first health probe fails, the process was born with a bad
    backend channel — unrecoverable in-process — so the script is
    re-executed via ``os.execv`` (a fresh process rolls a fresh
    connection).  A counter in ``EMG3D_TPU_REEXEC_N`` bounds the
    rebirths (limit ``EMG3D_TPU_REEXEC``, default 40); when exhausted,
    raises :class:`HealthError`.  The sleep before each rebirth
    escalates (15 s → 5 min) because bad-birth periods can last hours.

    Additionally, ``EMG3D_TPU_REEXEC_BUDGET_S`` caps the *wall-clock*
    of the whole rebirth loop: the first call stamps a start time into
    ``EMG3D_TPU_REEXEC_T0`` (inherited across re-executions), and any
    call past the budget raises :class:`HealthError` immediately so
    time-boxed callers get their fallback path instead of hours of
    escalating sleeps.

    No-op (returns the attempt count) when the process is healthy or
    when running on a local backend where :func:`probe` passes anyway.
    """
    import subprocess
    import sys

    n = int(os.environ.get("EMG3D_TPU_REEXEC_N", "0"))
    limit = int(os.environ.get("EMG3D_TPU_REEXEC", "40"))
    budget_s = os.environ.get("EMG3D_TPU_REEXEC_BUDGET_S")

    # Probe in a CHILD process with a hard timeout: a bad channel can
    # HANG device RPCs indefinitely (not just fail them), and a hung
    # in-process probe would block the rebirth loop forever.  The
    # child's verdict predicts this process's health only before jax
    # initializes a backend here, hence "call early".
    def _probe_child():
        # The child must probe the same platform as this process; a
        # sitecustomize may pre-select a platform regardless of the
        # inherited environment, so re-apply JAX_PLATFORMS via config.
        code = ("import os, jax; p = os.environ.get('JAX_PLATFORMS'); "
                "_ = p and jax.config.update('jax_platforms', p); "
                "from emg3d_tpu import backend; "
                "import sys; sys.exit(0 if backend.probe() else 1)")
        try:
            res = subprocess.run(
                [sys.executable, "-c", code], timeout=120,
                cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))),
                capture_output=True)
            return res.returncode == 0
        except subprocess.TimeoutExpired:
            return False

    # The child's verdict is a cheap hang-guard; the process's OWN
    # channel must still be probed (child and parent roll independent
    # connections), time-bounded because a bad channel can hang rather
    # than fail (probe_timed).
    if _probe_child() and probe_timed():
        # Healthy: clear the rebirth bookkeeping so this process's
        # children (and any much-later call here) don't inherit a stale
        # start time — a stale T0 plus a budget would otherwise raise
        # HealthError immediately instead of attempting a rebirth.
        os.environ.pop("EMG3D_TPU_REEXEC_T0", None)
        os.environ.pop("EMG3D_TPU_REEXEC_N", None)
        return n

    # Unhealthy: the rebirth loop's wall-clock starts at the FIRST bad
    # probe (stamped here, inherited across the re-executions).
    t0 = float(os.environ.setdefault("EMG3D_TPU_REEXEC_T0",
                                     str(time.time())))
    if budget_s is not None and time.time() - t0 > float(budget_s):
        raise HealthError(
            f"rebirth loop exceeded its wall-clock budget "
            f"({budget_s}s) after {n} re-executions")
    if n >= limit:
        raise HealthError(
            f"process born with an unhealthy backend channel {n} times "
            f"in a row (limit {limit})")
    if sleep is None:
        sleep = min(15.0 * 1.35 ** n, 300.0)
    if budget_s is not None and time.time() - t0 + sleep > float(budget_s):
        # Sleeping would overshoot the budget: fail over now rather
        # than burn the caller's remaining wall-clock on a nap.
        raise HealthError(
            f"rebirth loop would exceed its wall-clock budget "
            f"({budget_s}s) sleeping before rebirth {n + 1}")
    warnings.warn(
        f"emg3d-tpu: process born with an unhealthy backend channel "
        f"(rebirth {n + 1}/{limit}); re-executing in {sleep:.0f}s.",
        RuntimeWarning)
    time.sleep(sleep)
    os.environ["EMG3D_TPU_REEXEC_N"] = str(n + 1)
    argv = list(sys.argv if argv is None else argv)
    os.execv(sys.executable, [sys.executable] + argv)


def sync_readback(tree, all_leaves=False):
    """Synchronize on *completed execution* of outputs in ``tree``.

    ``jax.block_until_ready`` has been observed, on the tunneled axon
    TPU, to return at dispatch-ACK time while the executable has not
    actually run server-side — per-op timings taken that way sit at
    the ~0.1-1 ms dispatch floor regardless of workload size (the
    2026-08-19/20 ``"platform": "tpu"`` rows of
    ``bench_levels_results.jsonl``: a 256³ nu=2 smooth "in" 0.1 ms is
    ~40× beyond any chip's HBM roofline, and 32³ timed *slower* than
    256³).  Reading back a scalar *derived from* an output buffer
    cannot complete before the producing executable has, so timing
    loops must end reps with this instead.

    Touches the first array leaf (one executable's outputs become
    ready together); ``all_leaves=True`` touches every array leaf for
    trees assembled from several executables.  Returns the touched
    value(s) summed — also a cheap NaN canary for the timing loop.
    """
    import jax

    tot = 0.0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ndim"):
            tot += abs(complex(leaf[(0,) * leaf.ndim]))
            if not all_leaves:
                break
    return tot


def enable_compilation_cache(path="/tmp/emg3d_tpu_xla_cache"):
    """Persistent XLA compilation cache — enabled off-CPU only.

    Cold compiles dominate first-solve latency (e.g. ~3 min for a 64³
    hierarchy); the persistent cache removes them from the second
    process onward.  XLA:CPU (jax 0.9) segfaults intermittently while
    (de)serializing executables (observed on this host in both the put
    and the get path), so the cache stays off when the default backend
    is the CPU.  Returns whether the cache was enabled; safe to call
    repeatedly.
    """
    import jax

    if jax.default_backend() == "cpu":
        return False
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return True


_malloc_tuned = False


def tune_host_malloc():
    """Raise glibc's mmap/trim thresholds once, process-wide.

    XLA:CPU allocates every op output with malloc, and glibc serves
    requests above its dynamic mmap threshold (capped at 32 MB) with a
    fresh mmap that is unmapped again on free — so each big-buffer
    allocation pays page faults plus kernel zero-fill instead of
    reusing warm heap pages.  Measured on this host: alloc+touch of a
    135 MB buffer costs 42 ms from mmap vs 0.7 ms from the reused heap
    (60x).  Field components cross 32 MB between 128^3 and 192^3,
    which is exactly where the plain-cycle cells/s collapsed
    (tools/bench_scale_results.jsonl: 59k at 128^3 -> 39k at 192^3 ->
    18k at 256^3 while the kernels themselves scale linearly).

    mallopt(M_MMAP_THRESHOLD / M_TRIM_THRESHOLD, 1 GB) makes glibc
    serve and keep such blocks on the heap.  Freed memory is then
    retained by the process (higher steady RSS) — acceptable for a
    solver working set.  No-op on non-glibc libc or when
    EMG3D_TPU_MALLOC_TUNE=0.  Returns whether tuning is in effect.
    """
    global _malloc_tuned
    if _malloc_tuned:
        return True
    if os.environ.get("EMG3D_TPU_MALLOC_TUNE", "1") == "0":
        return False
    try:
        import ctypes

        libc = ctypes.CDLL(None)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        gb = 1 << 30
        ok = (libc.mallopt(M_MMAP_THRESHOLD, gb) == 1
              and libc.mallopt(M_TRIM_THRESHOLD, gb) == 1)
    except Exception:
        return False
    _malloc_tuned = bool(ok)
    return _malloc_tuned


def retry_transient(thunk, what="device step", rebuild=None):
    """Run ``thunk()``; wait out backend failure windows and retry.

    The thunk must synchronize its result (``float``/``np.asarray``/
    ``block_until_ready``) so asynchronous failures surface inside it.

    On a transient failure the backend is probed until healthy (device
    state survives windows, so the thunk's captured device arrays stay
    valid), then the thunk is retried.  If it fails again immediately
    after a healthy probe — state lost, e.g. an actual service restart
    — ``rebuild()`` is called (when given) to re-upload state from
    host-side sources before one final attempt.
    """
    global _was_healthy
    budget = _max_wait()
    t0 = time.monotonic()
    rebuilt = False
    while True:
        try:
            result = thunk()
            # A synchronized device step succeeding implies compute and
            # D2H both work: mark the channel healthy so a later mid-run
            # failure window is treated as transient (wait-out), not as
            # a born-bad channel — even if probe() was never called.
            _was_healthy = True
            return result
        except Exception as exc:
            if not is_transient(exc):
                raise
            remaining = budget - (time.monotonic() - t0)
            if remaining <= 0:
                raise
            try:
                wait_healthy(what, budget=remaining)
            except HealthError:
                raise exc from None
            # Healthy again: either plain-retry, or rebuild once if a
            # healthy retry already failed (dead device state).
            try:
                return thunk()
            except Exception as exc2:
                if not is_transient(exc2):
                    raise
                if rebuild is not None and not rebuilt:
                    rebuilt = True
                    import jax

                    jax.clear_caches()
                    rebuild()
                # loop: next iteration waits again / retries
