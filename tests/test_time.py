"""Tests for the native Fourier/DLF time-domain machinery.

Validation ladder: (1) filter design accuracy on held-out analytic
pairs; (2) the full transform on an elementary causal signal with known
spectrum; (3) physics: analytic frequency-domain fullspace responses
transformed to time vs the closed-form transient fullspace solution
(replaces the reference's empymod cross-check, test_time.py:113-114).
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import alternatives
from emg3d_tpu import transforms
from emg3d_tpu.time import Fourier


class TestFilterDesign:

    def test_design_accuracy(self):
        filt = transforms.design_filter()
        # Held-out-pair accuracy; the transform pipeline is limited by
        # interpolation/band-limits (~1e-3), not by the filter itself.
        assert filt.design_error < 5e-4
        assert filt.base.size == 201
        assert filt.sin is not None and filt.cos is not None

    def test_sine_on_fresh_pair(self):
        """∫ λ e^{-2λ²} sin(λr) dλ = √π r e^{-r²/8} / (2·8^{0.75})..."""
        filt = transforms.design_filter()
        r = np.logspace(-1, 1, 20)
        lam = filt.base[None, :] / r[:, None]
        approx = (lam * np.exp(-2 * lam ** 2) / r[:, None]) @ filt.sin
        # a=2: √π r/(4 a^{3/2}) e^{-r²/(4a)}
        exact = np.sqrt(np.pi) * r * np.exp(-r ** 2 / 8) / (4 * 2 ** 1.5)
        assert_allclose(approx, exact, rtol=1e-4)

    def test_cosine_on_fresh_pair(self):
        filt = transforms.design_filter()
        r = np.logspace(-1, 1, 20)
        lam = filt.base[None, :] / r[:, None]
        # a=3: ∫ e^{-3λ} cos(λr) dλ = 3/(9+r²)
        approx = (np.exp(-3 * lam) / r[:, None]) @ filt.cos
        assert_allclose(approx, 3 / (9 + r ** 2), rtol=1e-4)


class TestFourierDLF:
    """Transform of H(ω) = 1/(1+iω)  ⇔  h(t) = e^{-t} u(t)."""

    time = np.logspace(-1.5, 1.0, 15)

    def freq_and_data(self):
        freq = transforms.required_frequencies(self.time)
        omega = 2 * np.pi * freq
        return freq, 1.0 / (1 + 1j * omega)

    def test_impulse(self):
        freq, fdata = self.freq_and_data()
        t = self.time
        tdata = transforms.fourier_dlf(fdata, freq, t, signal=0)
        assert_allclose(tdata, np.exp(-t), rtol=1e-3, atol=1e-6)

    def test_switch_on(self):
        freq, fdata = self.freq_and_data()
        t = self.time
        tdata = transforms.fourier_dlf(fdata, freq, t, signal=1)
        assert_allclose(tdata, 1 - np.exp(-t), rtol=1e-3, atol=1e-6)

    def test_switch_off(self):
        freq, fdata = self.freq_and_data()
        t = self.time
        tdata = transforms.fourier_dlf(fdata, freq, t, signal=-1)
        assert_allclose(tdata, np.exp(-t), rtol=1e-3, atol=1e-6)

    def test_multi_column(self):
        freq, fdata = self.freq_and_data()
        stacked = np.stack([fdata, 2 * fdata], axis=1)
        tdata = transforms.fourier_dlf(stacked, freq, self.time, signal=0)
        assert tdata.shape == (self.time.size, 2)
        assert_allclose(tdata[:, 1], 2 * tdata[:, 0], rtol=1e-12)

    def test_bad_signal(self):
        freq, fdata = self.freq_and_data()
        with pytest.raises(ValueError, match='signal'):
            transforms.fourier_dlf(fdata, freq, self.time, signal=2)


class TestFullspacePhysics:
    """Analytic F(ω) → DLF → analytic transient fullspace solution."""

    @pytest.mark.parametrize('signal', [1, -1, 0])
    def test_fullspace_transient(self, signal):
        res = 1.0
        off = 900.0
        pts = np.array([[off, 0., 0.]])
        time = np.logspace(-2.5, 0.0, 12)

        fourier = Fourier(time=time, fmin=1e-4, fmax=1e3, signal=signal,
                          verb=0)

        fdata = np.array([
            alternatives.fullspace_dipole(
                pts, (0., 0., 0.), f, res)[0, 0]
            for f in fourier.freq_compute])

        tdata = fourier.freq2time(fdata, off)

        if signal == 0:
            # Impulse: numeric derivative of the analytic switch-on.
            dt = 1e-4 * time
            e_p = alternatives.fullspace_dipole_time(
                pts, (0., 0., 0.), time + dt, res, signal=1)[:, 0, 0]
            e_m = alternatives.fullspace_dipole_time(
                pts, (0., 0., 0.), time - dt, res, signal=1)[:, 0, 0]
            exact = (e_p - e_m) / (2 * dt)
        else:
            exact = alternatives.fullspace_dipole_time(
                pts, (0., 0., 0.), time, res, signal=signal)[:, 0, 0]

        assert_allclose(tdata, exact, rtol=2e-2,
                        atol=2e-2 * np.abs(exact).max())


class TestFourierClass:

    time = np.logspace(-2, 1, 11)

    def test_basics(self):
        f = Fourier(self.time, fmin=0.01, fmax=10, verb=0)
        assert f.freq_required.min() < 0.01
        assert f.freq_required.max() > 10
        assert np.all(f.freq_compute >= 0.01)
        assert np.all(f.freq_compute <= 10)
        assert f.freq_compute.size < f.freq_required.size
        assert 'dlf' in repr(f)
        with pytest.raises(TypeError, match='Unexpected '):
            Fourier(self.time, 0.01, 10, nonsense=1)

    def test_coarse_exclusive(self):
        with pytest.warns(UserWarning, match='mutually exclusive'):
            f = Fourier(self.time, 0.01, 10, verb=0,
                        input_freq=np.array([0.1, 1.0]), every_x_freq=2)
        assert f.every_x_freq is None

        f = Fourier(self.time, 0.01, 10, verb=0, every_x_freq=2)
        assert f.freq_coarse.size == int(np.ceil(
            f.freq_required.size / 2))

        f = Fourier(self.time, 0.01, 10, verb=0,
                    input_freq=np.array([0.1, 1.0, 5.0]))
        assert_allclose(f.freq_compute, [0.1, 1.0, 5.0])

    def test_interpolate_identity(self):
        """Without decimation, data passes through within [fmin, fmax]."""
        f = Fourier(self.time, 0.05, 5, verb=0)
        fdata = (np.random.default_rng(7).random(f.freq_compute.size)
                 + 1j * np.random.default_rng(8).random(
                     f.freq_compute.size))
        out = f.interpolate(fdata)
        assert_allclose(out[f.ifreq_interpolate], fdata)
        # Above fmax: zero.
        assert np.all(out[f.freq_required > 5] == 0.0)
        # Below fmin: finite, imag -> 0 towards DC.
        assert np.all(np.isfinite(out[f.ifreq_extrapolate]))

    def test_setters(self):
        f = Fourier(self.time, 0.01, 10, verb=0)
        n0 = f.freq_required.size
        f.time = np.logspace(-1, 1, 5)
        assert f.freq_required.size != n0
        f.fmin = 0.1
        f.fmax = 1.0
        assert np.all((f.freq_compute >= 0.1) & (f.freq_compute <= 1.0))
        f.signal = -1
        assert f.signal == -1
        f.every_x_freq = 3
        assert f.freq_coarse.size == int(np.ceil(f.freq_required.size / 3))
        f.input_freq = np.array([0.5])
        assert f.every_x_freq is None

    def test_bad_ft(self):
        with pytest.raises(ValueError, match='fftlog'):
            Fourier(self.time, 0.01, 10, ft='nonsense', verb=0)


class TestFFTLog:
    """FFTLog transform (scipy.fft.fht) on the e^{-t} pair and the
    transient fullspace."""

    time = np.logspace(-1.2, 0.8, 12)

    @pytest.mark.parametrize('signal', [0, 1, -1])
    def test_exponential_pair(self, signal):
        freq = transforms.required_frequencies_fftlog(self.time)
        omega = 2 * np.pi * freq
        fdata = 1.0 / (1 + 1j * omega)
        out = transforms.fourier_fftlog(fdata, freq, self.time,
                                        signal=signal)
        exact = (1 - np.exp(-self.time) if signal == 1
                 else np.exp(-self.time))
        assert_allclose(out, exact, rtol=2e-3, atol=1e-4)

    def test_fourier_class_fftlog(self):
        t = np.logspace(-2.5, 0.0, 10)
        off = 900.0
        pts = np.array([[off, 0., 0.]])
        fourier = Fourier(time=t, fmin=1e-4, fmax=1e3, signal=1,
                          ft='fftlog', verb=0)
        fdata = np.array([
            alternatives.fullspace_dipole(
                pts, (0., 0., 0.), f, 1.0)[0, 0]
            for f in fourier.freq_compute])
        tdata = fourier.freq2time(fdata, off)
        exact = alternatives.fullspace_dipole_time(
            pts, (0., 0., 0.), t, 1.0, signal=1)[:, 0, 0]
        assert_allclose(tdata, exact, rtol=3e-2,
                        atol=3e-2 * np.abs(exact).max())


class TestHankelFilter:
    """J0/J1 DLF design (groundwork for the layered-earth engine)."""

    def test_on_fresh_exponential_pairs(self):
        filt = transforms.design_hankel_filter()
        r = np.logspace(-1.5, 1.5, 15)
        lam = filt.base[None, :] / r[:, None]
        # ∫ e^{-3λ} J0(λr) dλ = 1/√(9+r²)
        approx = (np.exp(-3 * lam) / r[:, None]) @ filt.j0
        assert_allclose(approx, 1 / np.sqrt(9 + r ** 2), rtol=1e-6)
        # ∫ e^{-3λ} J1(λr) dλ = (1 - 3/√(9+r²))/r
        approx = (np.exp(-3 * lam) / r[:, None]) @ filt.j1
        assert_allclose(approx, (1 - 3 / np.sqrt(9 + r ** 2)) / r,
                        rtol=1e-5)


def test_custom_filter_object():
    """ftarg={'dlf': obj} accepts any duck-typed filter (e.g. empymod's
    DigitalFilter: .base/.cos/.sin/.factor), not just the built-in."""
    from emg3d_tpu import transforms

    ours = transforms.design_filter()

    class ThirdParty:
        name = "thirdparty"
        base = ours.base
        cos = ours.cos
        sin = ours.sin
        factor = ours.factor

    f = Fourier(time=np.logspace(-2, 1, 9), fmin=1e-3, fmax=1e2,
                signal=-1, ftarg={'dlf': ThirdParty()})
    assert f._filt.name == "thirdparty"
    assert f.freq_required.size > 0
