"""Native 1-D layered-earth CSEM engine (frequency domain).

The reference delegates all layered (1-D) modelling to empymod
(emg3d/_multiprocessing.py:156-463); emg3d_tpu bundles a self-contained
engine instead, built on the transmission-line formalism for layered
media (Michalski & Zheng 1990; Løseth & Ursin 2007 for the VTI
generalization) and the native Hankel-DLF filters
(:func:`emg3d_tpu.transforms.design_hankel_filter`):

- Each mode (TE/TM) in each layer is a 1-D transmission line with
  vertical wavenumber Γ and characteristic impedance Z:

      TE:  Γ² = λ² + ζ η_h           Z = ζ / Γ
      TM:  Γ² = (η_h/η_v) λ² + ζ η_h  Z = Γ / η_h

  with η = σ (+ iωε₀) per layer, ζ = iωμ₀, s = iω (the solver's
  convention, fields.py ``sval``).
- Interface reflections are accumulated by the standard recursion from
  the outermost halfspaces; in-layer multiples via the four-image sum
  with denominator 1 − R_a R_b e^{-2Γd}.
- The wavenumber → space transform is a J0/J1 digital linear filter.

Source and receiver must lie in the SAME layer (the common marine-CSEM
configuration; cross-layer transmission is future work).  Validation:
a uniform "layered" model reproduces the analytical fullspace dipole
solution (all conventions pinned); layered cases are cross-checked
against the 3-D multigrid solver in tests/test_layered.py.
"""

import numpy as np
from scipy import constants as const

from emg3d_tpu import transforms

__all__ = ['dipole_layered', 'fields_layered']


def __dir__():
    return __all__


def _tl_voltage_current(gam, za, zb, ra, rb, zr, zs):
    """SECONDARY transmission-line Green's functions within one layer.

    Unit shunt-current source at ``zs``; observation at ``zr`` (both in
    the layer [za, zb], z increasing downwards).  ``ra``/``rb`` are the
    global reflection coefficients looking up at ``za`` / down at ``zb``
    (already including all outer layers).

    Returns the *reflected-only* (v, dv/(−Γ·sign pattern)) sums: the
    direct term e^{-Γ|zr-zs|} is EXCLUDED — it diverges in λ at
    zr == zs; callers add the analytic space-domain primary field of the
    source layer instead (the standard direct-field split).

    The direct term also appears multiplied by the multiple-reflection
    denominator's expansion; consistency: the total in-layer response is
      [t_dir + t_a + t_b + t_ab1 + t_ab2]/damp
    and the primary corresponds to t_dir alone WITHOUT the 1/damp.  The
    secondary therefore is total − t_dir = (t_a + t_b + t_ab1 + t_ab2
    + t_dir·(1−damp))/damp.
    """
    d = zb - za
    ex = np.exp

    rr = ra * rb * ex(-2 * gam * d)
    damp = 1.0 - rr

    t_dir = ex(-gam * abs(zr - zs))
    sgn = np.sign(zr - zs) if zr != zs else 0.0
    t_a = ra * ex(-gam * ((zr - za) + (zs - za)))
    t_b = rb * ex(-gam * ((zb - zr) + (zb - zs)))
    t_ab1 = ra * rb * ex(-gam * (2 * d + (zr - zs)))
    t_ab2 = ra * rb * ex(-gam * (2 * d - (zr - zs)))

    v = (t_a + t_b + t_ab1 + t_ab2 + t_dir * rr) / damp

    # dV/dzr factors: e^{-Γ|zr-zs|} -> -Γ sgn; e^{-Γ(zr-za..)} -> -Γ;
    # e^{-Γ(zb-zr..)} -> +Γ; 2d+(zr-zs) -> -Γ; 2d-(zr-zs) -> +Γ.
    dv = (-t_a + t_b - t_ab1 + t_ab2 - sgn * t_dir * rr) / damp

    return v, dv


def _fullspace_primary(rvec, p, eta, zeta):
    """Analytic fullspace E and H of a unit electric point dipole.

    Isotropic medium: E from the Hertz-potential closed form (the same
    expression as tests/alternatives.fullspace_dipole), H from
    ∇×(p f) = ∇f × p with f = e^{-γr}/(4πr).
    """
    r = np.linalg.norm(rvec, axis=1)
    rh = rvec / r[:, None]
    gam = np.sqrt(zeta * eta)

    gr = gam * r
    f = np.exp(-gr) / (4 * np.pi * eta * r ** 3)
    t1 = (gr ** 2 + 3 * gr + 3)[:, None] * (rh @ p)[:, None] * rh
    t2 = (gr ** 2 + gr + 1)[:, None] * p[None, :]
    e = f[:, None] * (t1 - t2)

    hmag = (gr + 1) * np.exp(-gr) / (4 * np.pi * r ** 2)
    h = hmag[:, None] * np.cross(np.broadcast_to(p, rvec.shape), rh)
    return e, h


def _mode_params(lam2, eta_h, eta_v, zeta, mode):
    """Vertical wavenumber and characteristic impedance per layer."""
    if mode == 'te':
        gam = np.sqrt(lam2 + zeta * eta_h)
        z0 = zeta / gam
    else:
        gam = np.sqrt((eta_h / eta_v) * lam2 + zeta * eta_h)
        z0 = gam / eta_h
    return gam, z0


def _reflections(gam, z0, thick, ilay):
    """Global reflection coefficients at the two boundaries of ilay.

    ``gam``/``z0``: (nlayer, nlam), layer index 0 = top; ``thick``:
    (nlayer,) with inf outer layers.  Voltage-wave convention: the local
    coefficient looking from layer i into layer j is
    (Z_j − Z_i)/(Z_j + Z_i); global responses by the standard recursion
    from the outermost halfspaces inwards.

    Returns (ra, rb): seen looking up at the top boundary / down at the
    bottom boundary of layer ``ilay`` (zero for outer halfspaces).
    """
    nlay = gam.shape[0]
    zero = np.zeros_like(gam[0])

    # Looking DOWN at the bottom interface of layer i (between i, i+1):
    # start at the bottom-most interface (layer nlay-2 / halfspace).
    r_down = zero
    for i in range(nlay - 2, ilay - 1, -1):
        rloc = (z0[i + 1] - z0[i]) / (z0[i + 1] + z0[i])
        if i == nlay - 2:
            r_down = rloc
        else:
            phase = np.exp(-2 * gam[i + 1] * thick[i + 1])
            r_down = (rloc + r_down * phase) / (1 + rloc * r_down * phase)

    # Looking UP at the top interface of layer i (between i-1, i).
    r_up = zero
    for i in range(1, ilay + 1):
        rloc = (z0[i - 1] - z0[i]) / (z0[i - 1] + z0[i])
        if i == 1:
            r_up = rloc
        else:
            phase = np.exp(-2 * gam[i - 1] * thick[i - 1])
            r_up = (rloc + r_up * phase) / (1 + rloc * r_up * phase)

    ra = r_up if ilay > 0 else zero
    rb = r_down if ilay < nlay - 1 else zero
    return ra, rb


def fields_layered(src, receivers, depth, res_h, frequency, aniso=None,
                   filt=None):
    """E and H of an electric point dipole in a layered VTI medium.

    Parameters
    ----------
    src : array_like (x, y, z, azimuth, elevation)
        Electric point-dipole source of unit moment (z positive UP, as
        everywhere in emg3d).
    receivers : ndarray (n, 3)
        Receiver positions; must be in the same layer as the source.
    depth : array_like
        Interface depths (z, increasing; z positive up), size nlay-1.
        E.g. [-2000, 0] = halfspace below -2000, layer to 0, air above.
    res_h : array_like
        Horizontal resistivity per layer (size nlay, ordered from the
        bottom layer to the top layer).
    frequency : float
        Frequency (Hz), > 0.
    aniso : array_like, optional
        sqrt(res_v / res_h) per layer; default 1 (isotropic).

    Returns
    -------
    efield, hfield : ndarray (n, 3)
        Complex E (V/m) and H (A/m) at the receivers.
    """
    from emg3d_tpu.electrodes import rotation

    if filt is None:
        filt = transforms.design_hankel_filter()

    src = np.asarray(src, dtype=np.float64)
    receivers = np.atleast_2d(np.asarray(receivers, dtype=np.float64))

    # Convert to z-DOWN internally; layers ordered top (index 0) down.
    depth = np.sort(np.asarray(depth, dtype=np.float64))      # z-up asc.
    res_h = np.asarray(res_h, dtype=np.float64)
    nlay = res_h.size
    if depth.size != nlay - 1:
        raise ValueError("len(depth) must be len(res_h) - 1.")
    aniso = (np.ones(nlay) if aniso is None
             else np.asarray(aniso, dtype=np.float64))

    # z-down interface depths, descending z-up == ascending z-down.
    zif = -depth[::-1]                      # (nlay-1,) ascending z-down
    eta_h = (1.0 / res_h)[::-1]             # index 0 = top layer
    eta_v = eta_h / aniso[::-1] ** 2

    zs = -src[2]
    zr = -receivers[:, 2]

    # Layer index: layer i spans [zif[i-1], zif[i]] (z-down).
    def layer_of(z):
        return int(np.searchsorted(zif, z))

    ilay = layer_of(zs)
    if any(layer_of(z) != ilay for z in zr):
        raise NotImplementedError(
            "emg3d_tpu.layered: source and receivers must be in the "
            "same layer (cross-layer transmission is future work).")

    za = zif[ilay - 1] if ilay > 0 else -np.inf
    zb = zif[ilay] if ilay < nlay - 1 else np.inf
    thick = np.empty(nlay)
    thick[0] = np.inf
    thick[-1] = np.inf
    if nlay > 2:
        thick[1:-1] = np.diff(zif)

    omega = 2 * np.pi * frequency
    zeta = 1j * omega * const.mu_0

    # Horizontal offsets and azimuths.
    dx = receivers[:, 0] - src[0]
    dy = receivers[:, 1] - src[1]
    rho = np.sqrt(dx ** 2 + dy ** 2)
    rho = np.maximum(rho, 1e-9)
    cphi = dx / rho
    sphi = dy / rho
    c2phi = cphi ** 2 - sphi ** 2
    s2phi = 2 * sphi * cphi

    # Wavenumbers: DLF evaluation points per receiver offset.
    lam = filt.base[None, :] / rho[:, None]          # (n, nb)
    lam2 = lam ** 2

    out_e = np.zeros((receivers.shape[0], 3), dtype=np.complex128)
    out_h = np.zeros((receivers.shape[0], 3), dtype=np.complex128)

    # Source orientation (z-up frame); vertical moment flips sign in the
    # z-down frame.
    p = rotation(src[3], src[4])
    p_h = np.array([p[0], p[1]])
    pz_up = p[2]

    for irec in range(receivers.shape[0]):
        l_ = lam[irec]
        l2 = lam2[irec]
        r_ = rho[irec]

        mode_data = {}
        for mode in ('te', 'tm'):
            gam = np.empty((nlay, l_.size), dtype=np.complex128)
            z0 = np.empty_like(gam)
            for i in range(nlay):
                gam[i], z0[i] = _mode_params(
                    l2, eta_h[i], eta_v[i], zeta, mode)
            ra, rb = _reflections(gam, z0, thick, ilay)
            za_eff = za if np.isfinite(za) else min(zs, zr[irec]) - 1.0
            zb_eff = zb if np.isfinite(zb) else max(zs, zr[irec]) + 1.0
            if not np.isfinite(za):
                ra = np.zeros_like(ra)
            if not np.isfinite(zb):
                rb = np.zeros_like(rb)
            v_raw, dv_raw = _tl_voltage_current(
                gam[ilay], za_eff, zb_eff, ra, rb, zr[irec], zs)
            # V_i = (Z/2)·v_raw;  dV/dzr = (Z/2)Γ·dv_raw;
            # I_i = -(1/(ΓZ)) dV/dzr = -dv_raw/2.
            mode_data[mode] = {
                'gam': gam[ilay], 'z0': z0[ilay],
                'v': 0.5 * z0[ilay] * v_raw,
                'i': -0.5 * dv_raw,
            }

        vte, vtm = mode_data['te']['v'], mode_data['tm']['v']
        ite, itm = mode_data['te']['i'], mode_data['tm']['i']

        gam_tm = mode_data['tm']['gam']
        eta_vs = eta_v[ilay]
        eta_hs = eta_h[ilay]

        j0 = filt.j0
        j1 = filt.j1

        def h0(ker):
            return (ker / r_) @ j0

        def h1(ker):
            return (ker / r_) @ j1

        # J2 via recurrence: ∫ f J2 = ∫ f (2 J1/(λρ) − J0).
        def h2(ker):
            return 2.0 * ((ker / (l_ * r_)) / r_) @ j1 - h0(ker)

        # ---- Horizontal electric dipole of unit horizontal moment
        # along angle phi-reference; assembled for the actual p_h below.
        # Spectral fields (Michalski-Zheng formulation C):
        #   Ex ~ -(1/4π)[ (VTE+VTM) λ J0 + cos2φ (VTE−VTM) λ J2 ]
        #   Ey ~ -(1/4π)  sin2φ (VTE−VTM) λ J2
        #   Ez ~ +(1/4π) (λ²/η_v) I^TM ... cosφ J1
        sum_v = h0(l_ * (vte + vtm))
        dif_v = h2(l_ * (vte - vtm))

        # TL currents for H-fields and Ez.
        sum_i = h0(l_ * (ite + itm))
        dif_i = h2(l_ * (ite - itm))

        ez_ker = 2.0 * h1(l2 / eta_vs * itm)
        hz_ker = 2.0 * h1(l2 / zeta * vte)

        mh = np.hypot(p_h[0], p_h[1])
        if mh > 0:
            ca = p_h[0] / mh   # source-orientation cos/sin (horizontal)
            sa = p_h[1] / mh
            # Rotate receiver azimuth into the source frame.
            cb = cphi[irec] * ca + sphi[irec] * sa
            sb = -cphi[irec] * sa + sphi[irec] * ca
            c2b = cb * cb - sb * sb
            s2b = 2 * sb * cb

            # Fields in the source frame (x' along the dipole).
            exp_ = -(sum_v + c2b * dif_v) / (4 * np.pi)
            eyp_ = -(s2b * dif_v) / (4 * np.pi)
            ezp_ = cb * ez_ker / (4 * np.pi)

            hxp_ = (s2b * dif_i) / (4 * np.pi)
            hyp_ = -(sum_i - c2b * dif_i) / (4 * np.pi)
            hzp_ = sb * hz_ker / (4 * np.pi)

            # Rotate back to global frame; flip z-components to z-up.
            out_e[irec, 0] += mh * (ca * exp_ - sa * eyp_)
            out_e[irec, 1] += mh * (sa * exp_ + ca * eyp_)
            out_e[irec, 2] += mh * -ezp_
            out_h[irec, 0] += mh * (ca * hxp_ - sa * hyp_)
            out_h[irec, 1] += mh * (sa * hxp_ + ca * hyp_)
            out_h[irec, 2] += mh * -hzp_

        if abs(pz_up) > 0:
            raise NotImplementedError(
                "emg3d_tpu.layered: vertical source components are "
                "future work; use horizontal dipoles.")

    # Analytic space-domain primary (direct) field of the source layer
    # — the wavenumber-domain kernels above carry reflections only.
    if abs(aniso[::-1][ilay] - 1.0) > 1e-12:
        raise NotImplementedError(
            "emg3d_tpu.layered: anisotropy in the source layer needs "
            "the VTI fullspace primary (future work); other layers may "
            "be VTI.")
    rvec = receivers - src[:3][None, :]
    e_p, h_p = _fullspace_primary(rvec, p, eta_h[ilay], zeta)
    out_e += e_p
    out_h += h_p

    return out_e, out_h


def dipole_layered(src, receivers, depth, res_h, frequency, aniso=None,
                   rec_type='electric'):
    """Receiver responses of a unit dipole in a layered medium.

    Like :func:`fields_layered`, but projects onto oriented point
    receivers given as (x, y, z, azimuth, elevation) tuples and returns
    one complex response per receiver.
    """
    from emg3d_tpu.electrodes import rotation

    receivers = np.atleast_2d(np.asarray(receivers, dtype=np.float64))
    e, h = fields_layered(src, receivers[:, :3], depth, res_h, frequency,
                          aniso=aniso)
    out = np.empty(receivers.shape[0], dtype=np.complex128)
    fld = e if rec_type == 'electric' else h
    for i, rec in enumerate(receivers):
        out[i] = fld[i] @ rotation(rec[3], rec[4])
    return out
