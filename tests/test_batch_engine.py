"""Unit tests of the batched-solve engine's numerics (parallel.batch).

Fast, tiny-shape checks of the pieces the end-to-end batch tests
(tests/test_simulations.py::TestBatchParallel) exercise only at loose
tolerance: the shared-eta df64 rescaling, the Krylov breakdown guards,
and the converged-lane freeze.  All run in the quick tier.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from emg3d_tpu.ops import df64, operator
from emg3d_tpu.parallel import batch


def _shapes(nx, ny, nz):
    return [(nx, ny + 1, nz + 1), (nx + 1, ny, nz + 1),
            (nx + 1, ny + 1, nz)]


def _random_coeffs(rng, nx, ny, nz):
    eta = (-(rng.uniform(1e3, 5e3, (nx, ny, nz)))
           + 1j * rng.uniform(1e2, 5e2, (nx, ny, nz)))
    zeta = rng.uniform(1e3, 2e3, (nx, ny, nz))
    h = [rng.uniform(20, 60, n) for n in (nx, ny, nz)]
    return eta, zeta, h


def _level0_f32(eta64, zeta64, h64):
    """Level-0 array dict in f32 with df64 companions, as built by
    solver._build_hierarchy (solver.py:308-333)."""
    out = {}
    for name, val in (("eta_x", eta64), ("eta_y", eta64 * 1.1),
                      ("eta_z", eta64 * 0.9), ("zeta", zeta64)):
        hi, lo = df64.split_f64(np.asarray(val), np.float32)
        out[name] = jnp.asarray(hi)
        out[name + "_lo"] = jnp.asarray(lo)
    for name, hh in (("hx", h64[0]), ("hy", h64[1]), ("hz", h64[2])):
        out[name] = jnp.asarray(hh, dtype=jnp.float32)
        ihi, ilo = df64.split_f64(1.0 / np.asarray(hh), np.float32)
        out["i" + name] = jnp.asarray(ihi)
        out["i" + name + "_lo"] = jnp.asarray(ilo)
    return out


def test_scale_split_accuracy():
    """(hi,lo) * split scalar keeps ~2x working mantissa (the shared-eta
    batch path's per-task eta must stay df64-accurate, ADVICE r2)."""
    rng = np.random.default_rng(7)
    a64 = rng.normal(size=50) + 1j * rng.normal(size=50)
    sc64 = np.complex128(3.7 - 0.3j)

    hi, lo = df64.split_f64(a64, np.float32)
    schi, sclo = df64.split_f64(np.asarray([sc64]), np.float32)
    hi2, lo2 = df64.scale_split(jnp.asarray(hi), jnp.asarray(lo),
                                jnp.asarray(schi[0]), jnp.asarray(sclo[0]))

    got = np.asarray(hi2, dtype=np.complex128) + np.asarray(
        lo2, dtype=np.complex128)
    want = a64 * sc64
    assert np.abs(got - want).max() < 1e-13 * np.abs(want).max()

    # A hi-only rescale (the r2 bug) would be ~1e-7 off: pin that the
    # full-split product is orders of magnitude better than that.
    naive = np.asarray(
        np.complex64(sc64) * hi, dtype=np.complex128) + lo
    assert np.abs(naive - want).max() > 1e-9 * np.abs(want).max()


def test_shared_eta_df64_residual_multifrequency():
    """The batched split residual stays df64-accurate for scale != 1.

    Two tasks share one f32 hierarchy; task 1's eta is 3.7x task 0's
    (a second frequency).  The batched residual must agree with the
    float64 residual of the scaled system to far better than f32 — a
    hi-only eta rescale (pairing scale*hi with task-0's lo) degrades
    the comparison to O(1) of the residual's own size.
    """
    rng = np.random.default_rng(3)
    nx, ny, nz = 5, 4, 3
    eta64, zeta64, h64 = _random_coeffs(rng, nx, ny, nz)
    arrs = _level0_f32(eta64, zeta64, h64)

    scales64 = np.asarray([1.0, 3.7], dtype=np.complex128)
    schi, sclo = df64.split_f64(scales64, np.float32)
    arrs["eta_scale"] = jnp.asarray(schi)
    arrs["eta_scale_lo"] = jnp.asarray(sclo)

    # Split iterate: e represented as (hi, lo) complex64 pairs.
    e64 = tuple(rng.normal(size=s) + 1j * rng.normal(size=s)
                for s in _shapes(nx, ny, nz))
    e_hi = tuple(np.asarray(c, dtype=np.complex64) for c in e64)
    e_lo = tuple(np.asarray(c - h.astype(np.complex128), np.complex64)
                 for c, h in zip(e64, e_hi))

    # float64 operator application per task, on exactly the split
    # hierarchy values — the source is its c64 rounding, so the true
    # residual is TINY (~eps32 * |A e|): the near-converged regime
    # where a mispaired lo-part dominates the whole residual.
    def as128(hi, lo):
        return (np.asarray(hi, np.complex128)
                + np.asarray(lo, np.complex128))

    e_sum = tuple(as128(h, l) for h, l in zip(e_hi, e_lo))
    ax64, r64 = [], []
    for sc in scales64:
        ax = operator.amat_x(
            *[jnp.asarray(c) for c in e_sum],
            jnp.asarray(sc * as128(arrs["eta_x"], arrs["eta_x_lo"])),
            jnp.asarray(sc * as128(arrs["eta_y"], arrs["eta_y_lo"])),
            jnp.asarray(sc * as128(arrs["eta_z"], arrs["eta_z_lo"])),
            jnp.asarray(np.asarray(arrs["zeta"], np.float64)
                        + np.asarray(arrs["zeta_lo"], np.float64)),
            jnp.asarray(np.asarray(h64[0])),
            jnp.asarray(np.asarray(h64[1])),
            jnp.asarray(np.asarray(h64[2])))
        s_c64 = tuple(np.asarray(c, np.complex64) for c in ax)
        ax64.append(s_c64)
        r64.append(tuple(np.asarray(s, np.complex128)
                         - np.asarray(c, np.complex128)
                         for s, c in zip(s_c64, ax)))

    sb = tuple(jnp.stack([jnp.asarray(ax64[b][c]) for b in range(2)])
               for c in range(3))
    eb_hi = tuple(jnp.stack([jnp.asarray(c)] * 2) for c in e_hi)
    eb_lo = tuple(jnp.stack([jnp.asarray(c)] * 2) for c in e_lo)

    # Both dispatch paths: the core df64 executable (the TPU
    # production path) and the platform-adaptive dispatcher (which on
    # CPU takes the native-f64 evaluation).
    for caller in (batch._bresidual_norm_split_core,
                   batch._bresidual_norm_split):
        r_b, l2_b = caller(eb_hi, eb_lo, sb, arrs)
        for b in range(2):
            for comp in range(3):
                got = np.asarray(r_b[comp][b], np.complex128)
                num = np.linalg.norm(got - r64[b][comp])
                den = np.linalg.norm(r64[b][comp])
                # A hi-only eta rescale errs at O(1) of ||r|| here;
                # the split rescale ~1e-6 of it (2^-44 of ||A e||).
                assert num < 2e-3 * den, (caller.__name__ if hasattr(
                    caller, '__name__') else 'core', b, comp, num / den)


def test_jitted_split_residual_df64_exact():
    """The JITTED split residual keeps df64 accuracy (near-converged).

    Regression for the XLA:CPU fusion-emitter corruption: the default
    emitters silently demote the jitted df64 residual to ~f32 (found
    r3; fixed via df64.jit_exact / per-executable compiler options).
    Discriminator: with a source that is the f32 rounding of A e, the
    true residual is ~eps32*||A e||; a corrupted evaluation errs at
    O(1) of it, the exact one at ~1e-6 of it.
    """
    from emg3d_tpu import solver

    rng = np.random.default_rng(5)
    nx, ny, nz = 5, 4, 3
    eta64, zeta64, h64 = _random_coeffs(rng, nx, ny, nz)
    arrs = _level0_f32(eta64, zeta64, h64)

    e64 = tuple(rng.normal(size=s) + 1j * rng.normal(size=s)
                for s in _shapes(nx, ny, nz))
    e_hi = tuple(np.asarray(c, dtype=np.complex64) for c in e64)
    e_lo = tuple(np.asarray(c - h.astype(np.complex128), np.complex64)
                 for c, h in zip(e64, e_hi))

    def as128(hi, lo):
        return (np.asarray(hi, np.complex128)
                + np.asarray(lo, np.complex128))

    e_sum = tuple(as128(h, l) for h, l in zip(e_hi, e_lo))
    ax = operator.amat_x(
        *[jnp.asarray(c) for c in e_sum],
        jnp.asarray(as128(arrs["eta_x"], arrs["eta_x_lo"])),
        jnp.asarray(as128(arrs["eta_y"], arrs["eta_y_lo"])),
        jnp.asarray(as128(arrs["eta_z"], arrs["eta_z_lo"])),
        jnp.asarray(np.asarray(arrs["zeta"], np.float64)
                    + np.asarray(arrs["zeta_lo"], np.float64)),
        jnp.asarray(np.asarray(h64[0])),
        jnp.asarray(np.asarray(h64[1])),
        jnp.asarray(np.asarray(h64[2])))
    s_c = tuple(np.asarray(c, np.complex64) for c in ax)
    r64 = tuple(np.asarray(s, np.complex128)
                - np.asarray(c, np.complex128)
                for s, c in zip(s_c, ax))

    # Both the core df64 executable (TPU production path) and the
    # platform-adaptive dispatcher (native-f64 on CPU).
    for caller in (solver._residual_norm_split_core_jit,
                   solver._residual_norm_split_jit):
        r, _ = caller(
            tuple(jnp.asarray(c) for c in e_hi),
            tuple(jnp.asarray(c) for c in e_lo),
            tuple(jnp.asarray(c) for c in s_c), arrs)
        for comp in range(3):
            got = np.asarray(r[comp], np.complex128)
            num = np.linalg.norm(got - r64[comp])
            den = np.linalg.norm(r64[comp])
            assert num < 1e-4 * den, (comp, num / den)


def test_guarded_div_breakdown():
    """Zero and overflow denominators both yield inert zeros, not NaN."""
    num = jnp.asarray([1.0, 1.0, 1.0], dtype=jnp.complex64)
    den = jnp.asarray([0.0, 1e-45, 2.0], dtype=jnp.complex64)
    out = np.asarray(batch._guarded_div(num, den))
    assert out[0] == 0          # exact-zero denominator
    assert np.isfinite(out).all()   # denormal underflow -> inf guarded
    assert out[1] == 0
    assert_allclose(out[2], 0.5)


def test_bcg_direction_nonfinite_beta_is_zeroed():
    """0 * Inf = NaN in the beta product cannot reach the search
    direction (each factor is finite, but their product is guarded)."""
    shp = [(2,) + s for s in _shapes(3, 3, 3)]
    r = tuple(jnp.ones(s, dtype=jnp.complex64) for s in shp)
    v = p = tuple(jnp.zeros(s, dtype=jnp.complex64) for s in shp)
    big = jnp.asarray([1e30, 1.0], dtype=jnp.complex64)
    tiny = jnp.asarray([1e-30, 1.0], dtype=jnp.complex64)
    p_new, rho_new = batch._bcg_direction(
        r, r, p, v, rho=tiny * tiny, alpha=big, omega=tiny, first=False)
    assert all(np.isfinite(np.asarray(c)).all() for c in p_new)


def test_bcg_advance_freezes_converged_lane():
    """A converged lane's x survives non-finite active-lane scalars:
    frozen by selection, not by a multiplicative 0-gate (ADVICE r2)."""
    rng = np.random.default_rng(11)
    nx = ny = nz = 3
    eta64, zeta64, h64 = _random_coeffs(rng, nx, ny, nz)
    arrs = {
        "eta_x": jnp.asarray(eta64, jnp.complex64),
        "eta_y": jnp.asarray(eta64, jnp.complex64),
        "eta_z": jnp.asarray(eta64, jnp.complex64),
        "zeta": jnp.asarray(zeta64, jnp.float32),
        "hx": jnp.asarray(h64[0], jnp.float32),
        "hy": jnp.asarray(h64[1], jnp.float32),
        "hz": jnp.asarray(h64[2], jnp.float32),
    }
    shp = [(2,) + s for s in _shapes(nx, ny, nz)]

    def fld(c):
        return tuple(jnp.full(s, c, dtype=jnp.complex64) for s in shp)

    x = fld(2.0 + 1.0j)
    shat = phat = svec = fld(1.0)
    alpha = jnp.asarray([np.nan, 1.0], dtype=jnp.complex64)
    active = jnp.asarray([False, True])

    x_new, r_new, omega, rnorm = batch._bcg_advance(
        shat, phat, svec, x, alpha, active, arrs)

    for c_new, c_old in zip(x_new, x):
        # Lane 0 (converged): bit-identical freeze despite NaN alpha.
        assert_allclose(np.asarray(c_new[0]), np.asarray(c_old[0]))
        # Lane 1 (active): really updated.
        assert np.isfinite(np.asarray(c_new[1])).all()
        assert not np.allclose(np.asarray(c_new[1]), np.asarray(c_old[1]))


def test_shrink_size_and_keep_lanes():
    """Halving recompaction: largest power-of-two cut that holds every
    active task and stays a multiple of the mesh size."""
    # 16 lanes, 3 active, 4 devices -> 4 lanes (not 3: mesh multiple).
    assert batch._shrink_size(16, 3, 4) == 4
    # 16 lanes, 5 active, 4 devices -> 8 (4 < 5 active).
    assert batch._shrink_size(16, 5, 4) == 8
    # No halving possible.
    assert batch._shrink_size(4, 3, 1) == 4
    assert batch._shrink_size(4, 4, 4) == 4
    # Single device: shrink to the active count's power-of-two cover.
    assert batch._shrink_size(8, 1, 1) == 1
    # Odd batch (unpadded single-device run): 6 -> 3 (3 active).
    assert batch._shrink_size(6, 3, 1) == 3

    keep = batch._keep_lanes(np.array([False, True, False, True]), 2)
    assert sorted(keep.tolist()) == [1, 3]
    keep = batch._keep_lanes(
        np.array([False, True, False, False, True, False]), 3)
    assert keep.tolist()[:2] == [1, 4] and keep.size == 3


def test_bicgstab_shrink_parity(monkeypatch, capsys):
    """EMG3D_TPU_BATCH_SHRINK=1 recompacts converged-heavy batches and
    returns the same fields as the full-width run.

    Two of four tasks are zero-source (born converged), so the first
    iteration triggers a 4 -> 2 shrink on a 2-device mesh; lanes are
    algebraically independent, so the surviving lanes' iterates match
    the unshrunk run to f64 rounding.
    """
    from emg3d_tpu import fields, meshes, models

    h = np.ones(8) * 200.0
    grid = meshes.TensorMesh([h, h, h], origin=(-800.0, -800.0, -800.0))
    model = models.Model(grid, property_x=1.0)

    srcs = [(-200, 0, 0, 0, 0), (200, 0, 0, 0, 0),
            (0, -200, 0, 0, 0), (0, 200, 0, 0, 0)]
    sfields = [fields.get_source_field(grid, s, frequency=1.0)
               for s in srcs]
    for i in (2, 3):
        sfields[i].field *= 0.0

    mesh = batch.make_task_mesh(2)
    kw = dict(sslsolver=True, cycle='F', tol=1e-7, maxit=1,
              nu_init=0, nu_pre=2, nu_coarse=1, nu_post=2)

    ref, _ = batch.solve_batch_fields(model, sfields, mesh=mesh, **kw)

    monkeypatch.setenv("EMG3D_TPU_BATCH_SHRINK", "1")
    out, info = batch.solve_batch_fields(model, sfields, mesh=mesh,
                                         verb=4, **kw)
    assert "batch shrunk to 2/4 lanes" in capsys.readouterr().out

    for o, r in zip(out, ref):
        assert_allclose(o.field, r.field, rtol=1e-10, atol=1e-30)
    # The zero-source lanes stay exactly zero through stash/scatter.
    assert np.all(out[2].field == 0) and np.all(out[3].field == 0)


def test_mg_shrink_parity(monkeypatch, capsys):
    """The plain-MG batched driver also recompacts finished lanes:
    zero-source (born-converged) tasks are dropped before the first
    cycle, and the surviving lanes' fields match the full-width run."""
    from emg3d_tpu import fields, meshes, models

    h = np.ones(8) * 200.0
    grid = meshes.TensorMesh([h, h, h], origin=(-800.0, -800.0, -800.0))
    model = models.Model(grid, property_x=1.0)

    srcs = [(-200, 0, 0, 0, 0), (200, 0, 0, 0, 0),
            (0, -200, 0, 0, 0), (0, 200, 0, 0, 0)]
    sfields = [fields.get_source_field(grid, s, frequency=1.0)
               for s in srcs]
    for i in (2, 3):
        sfields[i].field *= 0.0

    mesh = batch.make_task_mesh(2)
    kw = dict(cycle='F', tol=1e-7, maxit=10,
              nu_init=0, nu_pre=2, nu_coarse=1, nu_post=2)

    ref, rinfo = batch.solve_batch_fields(model, sfields, mesh=mesh, **kw)

    monkeypatch.setenv("EMG3D_TPU_BATCH_SHRINK", "1")
    out, info = batch.solve_batch_fields(model, sfields, mesh=mesh,
                                         verb=4, **kw)
    assert "batch shrunk to 2/4 lanes" in capsys.readouterr().out

    for o, r in zip(out, ref):
        assert_allclose(o.field, r.field, rtol=1e-10, atol=1e-30)
    assert np.all(out[2].field == 0) and np.all(out[3].field == 0)
    assert info["exit_messages"] == rinfo["exit_messages"]
    assert_allclose(info["rel_error"][:2], rinfo["rel_error"][:2],
                    rtol=1e-8)


@pytest.mark.slow
def test_per_task_eta_stacked_blocked_parity(monkeypatch):
    """The per-task-eta mode (epsilon_r present) stacks the pre-blocked
    smoother operands on the task axis and matches sequential solves.

    epsilon_r makes eta affine (not linear) in s, disabling the
    shared-eta scale path; the hierarchy stacks eta per task — and
    since round 5 the parity-blocked smoother operands too, so the
    blocked layout (the CPU/TPU default where it wins) no longer
    silently degrades to strided gathers in this mode.
    """
    import jax

    from emg3d_tpu import fields, meshes, models, solver

    monkeypatch.setenv("EMG3D_TPU_SMOOTHER", "blocked")
    jax.clear_caches()

    h = np.ones(8) * 200.0
    grid = meshes.TensorMesh([h, h, h], origin=(-800.0, -800.0, -800.0))
    model = models.Model(grid, property_x=1.0, epsilon_r=1.0)

    freqs = [0.7, 1.3]
    src = (0, 0, 0, 0, 0)
    sfields = [fields.get_source_field(grid, src, frequency=f)
               for f in freqs]

    # The stacked hierarchy really carries task-stacked blocked eta
    # (4-D leaves) with shared (3-D) zeta blocks.
    vmodels = [models.VolumeModel(model, sf) for sf in sfields]
    # clevel bounded like _BatchHierarchies.get does (8**3 -> 3 levels).
    meta, levels = batch._build_hierarchy_batched(vmodels, 0, 1, 3)
    assert "blk" in levels[0]
    assert levels[0]["blk"][0][0].ndim == 4
    assert levels[0]["blk"][3][0].ndim == 3
    axes = batch._axes_of(levels[0])
    assert axes["blk"] == (0, 0, 0, None)

    kw = dict(cycle='F', tol=1e-7, maxit=20, linerelaxation=True)
    out, info = batch.solve_batch_fields(model, sfields, **kw)

    for sf, o in zip(sfields, out):
        ref = fields.Field(grid, frequency=sf._frequency)
        solver.solve(model, sf, efield=ref, verb=-1, sslsolver=False,
                     semicoarsening=False, **kw)
        # Norm-relative: both solves converged to tol 1e-7
        # independently; pointwise rtol on ~1e-25 denormal entries is
        # meaningless.
        diff = np.linalg.norm(o.field - ref.field)
        assert diff <= 1e-6 * np.linalg.norm(ref.field)
    jax.clear_caches()
