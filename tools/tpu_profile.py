"""TPU measurement pass: run during a healthy tunnel window.

Collects, in increasing cost order (so a window that closes mid-run
still yields the cheap numbers):

1. dispatch overhead (tiny kernel round trip),
2. per-kernel timings at BENCH sizes (GS phase, line phase thomas/pcr,
   df64 residual, restrict/prolong),
3. full solve wall times (plain F-cycles to 1e-6) per size.

Writes one JSON line per measurement to ``--out`` (default
/tmp/tpu_profile.jsonl) so partial runs are still useful.

Usage:  python - < tools/tpu_profile.py        (from /root/repo)
   or:  python tools/tpu_profile.py  (with cwd importable)
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_ENABLE_X64", "0")

# Make `python tools/tpu_profile.py` work directly: the repo root must
# be importable, AND the born-bad rebirth loop (backend.reexec_if_born_bad
# re-execs `[sys.executable] + sys.argv`) needs a real script path in
# sys.argv — launching via `python -c "runpy..."` leaves sys.argv=['-c']
# and the re-executed process dies with a usage error.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.environ.get("TPU_PROFILE_OUT", "/tmp/tpu_profile.jsonl")
SIZES = [int(s) for s in os.environ.get(
    "TPU_PROFILE_SIZES", "32,48,64,96,128").split(",")]


def emit(**kw):
    # v2: kernel timings readback-synced (timed/measure_floor) — v1
    # rows trusted block_until_ready, which the tunnel answers at
    # dispatch-ACK time (backend.sync_readback).
    kw["profile_version"] = 2
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


_READBACK_FLOOR = [0.0]


def timed(fn, *args, n=10):
    """Median wall time of fn(*args), synced by scalar readback.

    block_until_ready is NOT a completion barrier through the axon
    tunnel (see backend.sync_readback) — every rep ends with a scalar
    readback derived from the output instead, and the pre-measured
    readback floor (measure_floor) is subtracted.
    """
    from emg3d_tpu import backend

    out = fn(*args)
    backend.sync_readback(out)          # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        backend.sync_readback(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(float(np.median(ts)) - _READBACK_FLOOR[0], 0.0)


def measure_floor():
    """Dispatch+readback floor: sync_readback on a ready buffer."""
    import jax.numpy as jnp
    from emg3d_tpu import backend

    x = jnp.ones((4, 4), jnp.complex64)
    backend.sync_readback(x)
    ts = []
    for _ in range(30):
        t0 = time.perf_counter()
        backend.sync_readback(x)
        ts.append(time.perf_counter() - t0)
    _READBACK_FLOOR[0] = float(np.median(ts))
    return _READBACK_FLOOR[0]


# Peak HBM bandwidth per chip, GB/s (public chip specs), keyed by
# substrings of jax device_kind.  Used for the roofline position of
# each kernel: this solver is HBM-bound (stencils + small block
# solves, no matmuls), so achieved-GB/s / peak is the efficiency
# metric that matters — the analogue of MFU for a bandwidth-bound
# workload.
_HBM_PEAK_GBPS = (("v6", 1640.0), ("v5p", 2765.0), ("v5", 819.0),
                  ("v4", 1228.0), ("v3", 900.0))


def hbm_peak_gbps():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, peak in _HBM_PEAK_GBPS:
        if key in kind:
            return peak
    return None


def bw_fields(t, units, n, itemsize=4):
    """Roofline fields for a kernel touching ``units`` f32-plane
    equivalents of an n^3 grid: the MINIMUM HBM traffic model (each
    named array read or written once; strided color access touches
    every cache line, so partial reads count as full planes)."""
    bytes_moved = units * n ** 3 * itemsize
    gbps = bytes_moved / t / 1e9
    peak = hbm_peak_gbps()
    out = {"bytes_model": bytes_moved, "gbps": round(gbps, 1)}
    if peak:
        out["hbm_frac"] = round(gbps / peak, 3)
    return out


def main():
    from emg3d_tpu import backend

    backend.reexec_if_born_bad()
    backend.enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from emg3d_tpu import fields, meshes, models, solver
    from emg3d_tpu.ops import smoothers

    emit(metric="device", value=str(jax.devices()[0]))

    # 0. EFT integrity on this backend: does the jitted df64 split
    # residual keep double-single accuracy, or does the platform's
    # fused codegen corrupt the error-free transformations (as
    # XLA:CPU's fusion emitters do — see ops/df64.jit_exact)?  The
    # near-converged setup (s = c64(A e)) makes any corruption O(1)
    # of the true residual.
    try:
        from emg3d_tpu.ops import df64 as _df64
        from emg3d_tpu.ops import operator as _op

        rng = np.random.default_rng(5)
        nx, ny, nz = 9, 8, 7
        eta64 = (-(rng.uniform(1e3, 5e3, (nx, ny, nz)))
                 + 1j * rng.uniform(1e2, 5e2, (nx, ny, nz)))
        zeta64 = rng.uniform(1e3, 2e3, (nx, ny, nz))
        h64 = [rng.uniform(20, 60, n) for n in (nx, ny, nz)]
        arrs = {}
        for nm, val in (("eta_x", eta64), ("eta_y", 1.1 * eta64),
                        ("eta_z", 0.9 * eta64), ("zeta", zeta64)):
            hi, lo = _df64.split_f64(np.asarray(val), np.float32)
            arrs[nm], arrs[nm + "_lo"] = jnp.asarray(hi), jnp.asarray(lo)
        for nm, hh in zip("xyz", h64):
            arrs["h" + nm] = jnp.asarray(hh, dtype=jnp.float32)
            ihi, ilo = _df64.split_f64(1.0 / np.asarray(hh), np.float32)
            arrs["ih" + nm] = jnp.asarray(ihi)
            arrs["ih" + nm + "_lo"] = jnp.asarray(ilo)
        shp = [(nx, ny + 1, nz + 1), (nx + 1, ny, nz + 1),
               (nx + 1, ny + 1, nz)]
        e64 = [rng.normal(size=c) + 1j * rng.normal(size=c) for c in shp]
        e_hi = tuple(np.asarray(c, np.complex64) for c in e64)
        e_lo = tuple(np.asarray(c - h.astype(np.complex128), np.complex64)
                     for c, h in zip(e64, e_hi))

        def as128(hi, lo):
            return np.asarray(hi, np.complex128) + np.asarray(
                lo, np.complex128)

        e_sum = tuple(as128(h, l) for h, l in zip(e_hi, e_lo))
        # f64 reference on the HOST CPU backend (x64 is off globally,
        # and the TPU should not be asked for f64).
        with jax.enable_x64(True):
            ax = jax.jit(_op.amat_x, backend="cpu")(
                *e_sum,
                as128(arrs["eta_x"], arrs["eta_x_lo"]),
                as128(arrs["eta_y"], arrs["eta_y_lo"]),
                as128(arrs["eta_z"], arrs["eta_z_lo"]),
                np.asarray(arrs["zeta"], np.float64)
                + np.asarray(arrs["zeta_lo"], np.float64),
                *[np.asarray(hh) for hh in h64])
            ax = [np.asarray(c) for c in ax]
        s_c = tuple(np.asarray(c, np.complex64) for c in ax)
        r64 = tuple(np.asarray(a, np.complex128)
                    - np.asarray(b, np.complex128)
                    for a, b in zip(s_c, ax))
        for tag, jit_fn in (("jit_exact", _df64.jit_exact),
                            ("plain_jit", jax.jit)):
            f = jit_fn(_df64.residual_norm_split_df64)
            r, _ = f(tuple(map(jnp.asarray, e_hi)),
                     tuple(map(jnp.asarray, e_lo)),
                     tuple(map(jnp.asarray, s_c)), arrs)
            rel = max(
                float(np.linalg.norm(np.asarray(r[c], np.complex128)
                                     - r64[c])
                      / np.linalg.norm(r64[c])) for c in range(3))
            emit(metric=f"df64_eft_integrity_{tag}", rel_error=rel,
                 ok=rel < 1e-4)
    except Exception as exc:
        emit(metric="df64_eft_integrity_error", error=str(exc)[:200])

    # 1. dispatch overhead + the readback floor every kernel timing
    # below subtracts (sync="readback" marks rows measured this way;
    # older rows without it used block_until_ready, which the tunnel
    # has answered at dispatch-ACK time — see backend.sync_readback).
    emit(metric="readback_floor_s", value=measure_floor())
    x = jnp.ones(8)
    f = jax.jit(lambda a: a + 1.0)
    emit(metric="dispatch_roundtrip_s", value=timed(f, x, n=30),
         sync="readback")

    for n in SIZES:
        try:
            h = np.full(n, 50.0)
            grid = meshes.TensorMesh([h, h, h], origin=(-n * 25.0,) * 3)
            model = models.Model(grid, property_x=1.0)
            sfield = fields.get_source_field(
                grid, source=(0., 0., 0., 0., 0.), frequency=1.0)
            vmodel = models.VolumeModel(model, sfield)
            meta, arrays = solver._build_hierarchy(vmodel, 0, 0, 1)
            arrs = arrays[0]
            s = solver._field_to_dev(sfield)
            e = tuple(jnp.zeros_like(c) for c in s)

            # Traffic models (f32-plane units of n^3): one GS phase
            # reads e+s+eta (complex pairs) + zeta = 19 planes and
            # writes the 3 updated complex fields = 6 planes; the df64
            # residual carries hi+lo pairs of everything.
            t = timed(solver._gs_phase_jit, e, s, arrs, (0, 0, 0), n=5)
            emit(metric="gs_phase_s", size=n, value=t,
                 cells_per_s=round(n ** 3 / 8 / t),
                 **bw_fields(t, 25, n))

            # Whole-smooth (nu=2) granularity: strided phases vs the
            # parity-blocked (2x2x2 de-interleaved) layout — decides
            # the TPU default of EMG3D_TPU_SMOOTHER ('blocked' wins
            # 1.4-1.5x on CPU; stride-2 lane gathers may lower badly
            # on TPU).  Conversion cost is included (it amortizes
            # over the 16 phases of the call).
            for impl in ("xla", "blocked"):
                os.environ["EMG3D_TPU_SMOOTHER"] = impl
                jax.clear_caches()
                sw = jax.jit(lambda e_, s_: smoothers.gauss_seidel(
                    *e_, *s_, arrs["eta_x"], arrs["eta_y"],
                    arrs["eta_z"], arrs["zeta"], arrs["hx"],
                    arrs["hy"], arrs["hz"], 2))
                t = timed(sw, e, s, n=5)
                emit(metric=f"gs_smooth_nu2_{impl}_s", size=n, value=t,
                     cells_per_s=round(2 * n ** 3 / t),
                     **bw_fields(t, 2 * 25 if impl == "xla" else 12 + 16,
                                 n))
            os.environ.pop("EMG3D_TPU_SMOOTHER", None)
            jax.clear_caches()

            for solver_kind in ("thomas", "pcr"):
                os.environ["EMG3D_TPU_LINE_SOLVER"] = solver_kind
                jax.clear_caches()
                t = timed(solver._line_phase_jit, e, s, arrs, (0, 0), 0,
                          n=5)
                emit(metric=f"line_phase_{solver_kind}_s", size=n,
                     value=t, lines_per_s=round(n * n / 4 / t),
                     **bw_fields(t, 25, n))
            os.environ.pop("EMG3D_TPU_LINE_SOLVER", None)
            jax.clear_caches()

            # Whole x-line-relax smooth (nu=2, lr_dir=1): strided
            # gathers vs the parity-blocked layout — decides
            # EMG3D_TPU_SMOOTHER for the PRODUCTION config (where the
            # reference spends >90% of runtime).  The blocked variant
            # includes the per-call field (de)interleave, exactly as
            # the solver pays it (solver._smooth_dev).
            try:
                from emg3d_tpu.ops import blocked as _blk
                blk_ops = _blk.block_model_operands(
                    arrs["eta_x"], arrs["eta_y"], arrs["eta_z"],
                    arrs["zeta"])
                lws = jax.jit(lambda e_, s_: smoothers.gauss_seidel_line(
                    *e_, *s_, arrs["eta_x"], arrs["eta_y"],
                    arrs["eta_z"], arrs["zeta"], arrs["hx"],
                    arrs["hy"], arrs["hz"], 2, 0))
                t = timed(lws, e, s, n=5)
                emit(metric="line_smooth_nu2_xla_s", size=n, value=t,
                     cells_per_s=round(2 * n ** 3 / t),
                     **bw_fields(t, 2 * 25, n))
                lwb = jax.jit(lambda e_, s_: _blk.smooth_blocked_dev(
                    e_, s_, blk_ops, arrs["hx"], arrs["hy"],
                    arrs["hz"], 1, 2))
                t = timed(lwb, e, s, n=5)
                emit(metric="line_smooth_nu2_blocked_s", size=n,
                     value=t, cells_per_s=round(2 * n ** 3 / t),
                     **bw_fields(t, 12 + 16, n))
            except Exception as exc:
                emit(metric="line_smooth_error", size=n,
                     error=str(exc)[:200])
            jax.clear_caches()

            t = timed(lambda: solver._residual_norm_split_jit(
                e, e, s, arrs)[1], n=5)
            emit(metric="df64_residual_s", size=n, value=t,
                 cells_per_s=round(n ** 3 / t),
                 **bw_fields(t, 38, n))

            # Mosaic-compiled whole-phase Pallas kernel vs the XLA
            # phase (VMEM-resident v1 — expect failures above the
            # VMEM-feasible size; that failure bound is itself the
            # profile result that sizes the tiled variant).
            try:
                from emg3d_tpu.ops import pallas_gs
                P = (arrs["eta_x"], arrs["eta_y"], arrs["eta_z"],
                     arrs["zeta"], arrs["hx"], arrs["hy"], arrs["hz"])
                pal = jax.jit(lambda e_, s_: pallas_gs.
                              gauss_seidel_phase_pallas(
                                  *e_, *s_, *P, 0, 0, 0))
                t = timed(pal, e, s, n=5)
                emit(metric="gs_phase_pallas_s", size=n, value=t,
                     cells_per_s=round(n ** 3 / 8 / t),
                     **bw_fields(t, 25, n))
            except Exception as exc:
                emit(metric="gs_phase_pallas_error", size=n,
                     error=str(exc)[:200])

            # Fine-level tiled double-buffered kernel, per tile size.
            for tt in (2, 4, 8):
                try:
                    pal_t = jax.jit(lambda e_, s_, tt=tt: pallas_gs.
                                    gauss_seidel_phase_pallas_tiled(
                                        *e_, *s_, *P, 0, 0, 0,
                                        tile=tt))
                    t = timed(pal_t, e, s, n=5)
                    emit(metric="gs_phase_pallas_tiled_s", size=n,
                         tile=tt, value=t,
                         cells_per_s=round(n ** 3 / 8 / t),
                         **bw_fields(t, 25, n))
                except Exception as exc:
                    emit(metric="gs_phase_pallas_tiled_error", size=n,
                         tile=tt, error=str(exc)[:200])
        except Exception as exc:
            emit(metric="kernel_block_error", size=n,
                 error=str(exc)[:200])

    # 3. full solves.
    for n in SIZES:
        try:
            h = np.full(n, 50.0)
            grid = meshes.TensorMesh([h, h, h], origin=(-n * 25.0,) * 3)
            model = models.Model(grid, property_x=1.0)
            sfield = fields.get_source_field(
                grid, source=(0., 0., 0., 0., 0.), frequency=1.0)
            # Both smoother layouts end-to-end (the kernel-level
            # comparison above can hide dispatch/fusion effects).
            for impl in ("xla", "blocked"):
                os.environ["EMG3D_TPU_SMOOTHER"] = impl
                jax.clear_caches()
                t0 = time.perf_counter()
                efield, info = solver.solve(
                    model, sfield, plain=True, cycle='F', tol=1e-6,
                    maxit=50, return_info=True, verb=0)
                cold = time.perf_counter() - t0
                t0 = time.perf_counter()
                efield, info = solver.solve(
                    model, sfield, plain=True, cycle='F', tol=1e-6,
                    maxit=50, return_info=True, verb=0)
                warm = time.perf_counter() - t0
                try:
                    stats = jax.local_devices()[0].memory_stats() or {}
                    peak = stats.get("peak_bytes_in_use")
                except Exception:
                    peak = None
                # Approximate per-cycle traffic: (nu_pre+nu_post)=4
                # sweeps x 8 phases x 25 planes + residual 38 +
                # transfers ~50, times the 8/7 level-ladder factor
                # ~= 1015 plane units (strided-layout model).
                bw = bw_fields(warm, 1015 * max(info["it_mg"], 1), n)
                tag = "" if impl == "xla" else "_blocked"
                emit(metric=f"solve_plain_F{tag}", size=n,
                     cold_s=round(cold, 3), warm_s=round(warm, 3),
                     it_mg=info["it_mg"],
                     cells_per_s=round(n ** 3 / warm),
                     rel_error=float(info["rel_error"]),
                     exit=info["exit_message"],
                     peak_hbm_bytes=peak, **bw)
            os.environ.pop("EMG3D_TPU_SMOOTHER", None)
        except Exception as exc:
            emit(metric="solve_error", size=n, error=str(exc)[:200])

    # 4. production-config solves (the solver DEFAULT:
    # MG-preconditioned BiCGSTAB + semicoarsening + line relaxation —
    # the reference's >90%-in-smoothing regime) and the cycle-jit
    # crossover (EMG3D_TPU_CYCLE_JIT fuses cycle+accumulate+norm into
    # one dispatch — a device-dispatch-latency play whose win has
    # never been measured on the tunneled TPU).
    for n in [s for s in SIZES if s >= 64] or SIZES[-1:]:
        try:
            h = np.full(n, 50.0)
            grid = meshes.TensorMesh([h, h, h], origin=(-n * 25.0,) * 3)
            model = models.Model(grid, property_x=1.0)
            sfield = fields.get_source_field(
                grid, source=(0., 0., 0., 0., 0.), frequency=1.0)
            for impl in ("xla", "blocked"):
                os.environ["EMG3D_TPU_SMOOTHER"] = impl
                jax.clear_caches()
                t0 = time.perf_counter()
                efield, info = solver.solve(
                    model, sfield, sslsolver=True, semicoarsening=True,
                    linerelaxation=True, tol=1e-6, maxit=50,
                    return_info=True, verb=0)
                cold = time.perf_counter() - t0
                t0 = time.perf_counter()
                efield, info = solver.solve(
                    model, sfield, sslsolver=True, semicoarsening=True,
                    linerelaxation=True, tol=1e-6, maxit=50,
                    return_info=True, verb=0)
                warm = time.perf_counter() - t0
                emit(metric=f"solve_production_{impl}", size=n,
                     cold_s=round(cold, 3), warm_s=round(warm, 3),
                     it_mg=info["it_mg"], it_ssl=info.get("it_ssl", 0),
                     cells_per_s=round(n ** 3 / warm),
                     rel_error=float(info["rel_error"]),
                     exit=info["exit_message"])
            os.environ.pop("EMG3D_TPU_SMOOTHER", None)
        except Exception as exc:
            emit(metric="solve_production_error", size=n,
                 error=str(exc)[:200])

    # 5. Krylov variants at production scale (all three are native
    # device-side, but cgs/gcrotmk carry per-inner-step host scalars —
    # gcrotmk additionally a host least-squares per Arnoldi step; their
    # dispatch-latency cost on the tunneled TPU has never been
    # measured).
    n = 64 if 64 in SIZES else SIZES[-1]
    try:
        h = np.full(n, 50.0)
        grid = meshes.TensorMesh([h, h, h], origin=(-n * 25.0,) * 3)
        model = models.Model(grid, property_x=1.0)
        sfield = fields.get_source_field(
            grid, source=(0., 0., 0., 0., 0.), frequency=1.0)
        for kry in ("bicgstab", "cgs", "gcrotmk"):
            jax.clear_caches()
            t0 = time.perf_counter()
            efield, info = solver.solve(
                model, sfield, sslsolver=kry if kry != "bicgstab"
                else True, semicoarsening=True, linerelaxation=True,
                tol=1e-6, maxit=50, return_info=True, verb=0)
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            efield, info = solver.solve(
                model, sfield, sslsolver=kry if kry != "bicgstab"
                else True, semicoarsening=True, linerelaxation=True,
                tol=1e-6, maxit=50, return_info=True, verb=0)
            warm = time.perf_counter() - t0
            emit(metric=f"solve_krylov_{kry}", size=n,
                 cold_s=round(cold, 3), warm_s=round(warm, 3),
                 it_ssl=info.get("it_ssl", 0), it_mg=info["it_mg"],
                 cells_per_s=round(n ** 3 / warm),
                 exit=info["exit_message"])
    except Exception as exc:
        emit(metric="solve_krylov_error", size=n, error=str(exc)[:200])

    try:
        for cj in ("0", "1"):
            os.environ["EMG3D_TPU_CYCLE_JIT"] = cj
            import jax as _jax
            _jax.clear_caches()
            t0 = time.perf_counter()
            efield, info = solver.solve(
                model, sfield, plain=True, cycle='F', tol=1e-6,
                maxit=50, return_info=True, verb=0)
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            efield, info = solver.solve(
                model, sfield, plain=True, cycle='F', tol=1e-6,
                maxit=50, return_info=True, verb=0)
            warm = time.perf_counter() - t0
            emit(metric=f"solve_plain_F_cyclejit{cj}", size=n,
                 cold_s=round(cold, 3), warm_s=round(warm, 3),
                 it_mg=info["it_mg"], cells_per_s=round(n ** 3 / warm),
                 exit=info["exit_message"])
        os.environ.pop("EMG3D_TPU_CYCLE_JIT", None)
    except Exception as exc:
        emit(metric="solve_cyclejit_error", size=n, error=str(exc)[:200])


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:
        emit(metric="fatal", error=str(exc)[:300])
        sys.exit(1)
