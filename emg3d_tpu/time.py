"""Time-domain CSEM modelling via frequency-domain solves.

API-parity rebuild of the reference Fourier class (emg3d/time.py:33-436,
following Werthmüller/Mulder/Slob 2021): compute the 3-D response at a
coarse, band-limited set of frequencies, interpolate to the full required
range (spline within [fmin, fmax], PCHIP-anchored extrapolation below
fmin, zero above fmax), and transform to time.

The reference outsources the required-frequency computation and the
transform itself to empymod; here both are native
(:mod:`emg3d_tpu.transforms`): self-designed sine/cosine DLF filters and
a splined-DLF evaluation.
"""

import warnings

import numpy as np
import scipy as sp

from emg3d_tpu import transforms

__all__ = ['Fourier']


def __dir__():
    return __all__


class Fourier:
    """Frequency-to-time management for time-domain CSEM.

    Parameters mirror the reference (time.py:120-146): ``time``, band
    limits ``fmin``/``fmax``, ``signal`` ∈ {-1, 0, 1} (switch-off,
    impulse, switch-on), ``ft`` ('dlf' / 'sin' / 'cos'), ``ftarg``
    (supports ``pts_per_dec`` and a ``DigitalFilter`` under 'dlf'),
    and the mutually-exclusive ``input_freq`` / ``every_x_freq``.
    """

    def __init__(self, time, fmin, fmax, signal=0, ft='dlf', ftarg=None,
                 **kwargs):
        self._time = np.asarray(time, dtype=np.float64)
        self._fmin = fmin
        self._fmax = fmax
        self._signal = signal
        self._ft = ft
        self._ftarg = {} if ftarg is None else dict(ftarg)
        self._input_freq = kwargs.pop('input_freq', None)
        self._every_x_freq = kwargs.pop('every_x_freq', None)
        self.verb = kwargs.pop('verb', 3)

        if kwargs:
            raise TypeError(f"Unexpected **kwargs: {list(kwargs.keys())}.")

        self._check_coarse_inputs(keep_inp_freq=True)
        self._check_time()

    def __repr__(self):
        return (f"{self.__class__.__name__}: {self._ft}; "
                f"{self.time.min()}-{self.time.max()} s; "
                f"{self.fmin}-{self.fmax} Hz")

    # -- pure properties ----------------------------------------------------

    @property
    def freq_required(self):
        """Frequencies required to carry out the Fourier transform."""
        return self._freq_req

    @property
    def freq_coarse(self):
        """Coarse frequency range (≠ freq_required if decimated)."""
        if self.every_x_freq is None and self.input_freq is None:
            return self.freq_required
        elif self.every_x_freq is None:
            return self.input_freq
        else:
            return self.freq_required[::self.every_x_freq]

    @property
    def ifreq_compute(self):
        """Mask of freq_coarse which have to be computed."""
        return ((self.freq_coarse >= self.fmin) &
                (self.freq_coarse <= self.fmax))

    @property
    def freq_compute(self):
        """Frequencies at which the 3-D model has to be solved."""
        return self.freq_coarse[self.ifreq_compute]

    @property
    def ifreq_extrapolate(self):
        """Mask of the frequencies to extrapolate (< fmin)."""
        return self.freq_required < self.fmin

    @property
    def freq_extrapolate(self):
        """Frequencies below fmin (PCHIP-anchored extrapolation)."""
        return self.freq_required[self.ifreq_extrapolate]

    @property
    def ifreq_interpolate(self):
        """Mask of the frequencies to interpolate."""
        return ((self.freq_required >= self.fmin) &
                (self.freq_required <= self.fmax))

    @property
    def freq_interpolate(self):
        """Frequencies within [fmin, fmax] (spline interpolation)."""
        return self.freq_required[self.ifreq_interpolate]

    @property
    def ft(self):
        """Type of Fourier transform."""
        return self._ft

    @property
    def ftarg(self):
        """Fourier transform arguments."""
        return self._ftarg

    # -- properties with setters ----------------------------------------------

    @property
    def time(self):
        """Desired times (s)."""
        return self._time

    @time.setter
    def time(self, time):
        self._time = np.asarray(time, dtype=np.float64)
        self._check_time()

    @property
    def fmax(self):
        """Maximum frequency (Hz) to compute."""
        return self._fmax

    @fmax.setter
    def fmax(self, fmax):
        self._fmax = fmax

    @property
    def fmin(self):
        """Minimum frequency (Hz) to compute."""
        return self._fmin

    @fmin.setter
    def fmin(self, fmin):
        self._fmin = fmin

    @property
    def signal(self):
        """Signal in time domain {-1, 0, 1}."""
        return self._signal

    @signal.setter
    def signal(self, signal):
        self._signal = signal

    @property
    def input_freq(self):
        """If set, freq_coarse equals input_freq."""
        return self._input_freq

    @input_freq.setter
    def input_freq(self, input_freq):
        self._input_freq = input_freq
        self._check_coarse_inputs(keep_inp_freq=True)

    @property
    def every_x_freq(self):
        """If set, freq_coarse takes every x-th required frequency."""
        return self._every_x_freq

    @every_x_freq.setter
    def every_x_freq(self, every_x_freq):
        self._every_x_freq = every_x_freq
        self._check_coarse_inputs(keep_inp_freq=False)

    # -- the work --------------------------------------------------------------

    def fourier_arguments(self, ft, ftarg):
        """Set Fourier type and its arguments."""
        self._ft = ft
        self._ftarg = dict(ftarg)
        self._check_time()

    def interpolate(self, fdata):
        """Interpolate from computed (freq_compute) to required data.

        Reference time.py:303-355: cubic spline on log-f within
        [fmin, fmax]; PCHIP with a 1e-100 Hz real-valued anchor below
        fmin; 0 above fmax.
        """
        fdata = np.asarray(fdata)
        out = np.zeros(self.freq_required.size, dtype=np.complex128)

        # 1. Interpolate between fmin and fmax.
        if self.freq_coarse.size != self.freq_required.size:
            Spline = sp.interpolate.InterpolatedUnivariateSpline
            int_real = Spline(np.log(self.freq_compute),
                              fdata.real)(np.log(self.freq_interpolate))
            int_imag = Spline(np.log(self.freq_compute),
                              fdata.imag)(np.log(self.freq_interpolate))
            out[self.ifreq_interpolate] = int_real + 1j * int_imag
        else:
            out[self.ifreq_interpolate] = fdata

        # 2. Extrapolate below fmin with a DC anchor at 1e-100 Hz:
        # real part of the lowest computed frequency, zero imaginary.
        freq_ext = np.r_[1e-100, self.freq_compute]
        data_ext = np.r_[fdata[0].real - 1e-100j, fdata]

        Pchip = sp.interpolate.PchipInterpolator
        ext_real = Pchip(freq_ext, data_ext.real)(self.freq_extrapolate)
        ext_imag = Pchip(freq_ext, data_ext.imag)(self.freq_extrapolate)
        out[self.ifreq_extrapolate] = ext_real + 1j * ext_imag

        return out

    def freq2time(self, fdata, off):
        """Transform to time domain: the actual Fourier transform.

        Parameters
        ----------
        fdata : ndarray
            Frequency-domain data at ``freq_compute``.
        off : float
            Offset (m); kept for reference API parity (the splined DLF
            does not need it).

        Returns
        -------
        tdata : ndarray
            Time-domain data at ``Fourier.time``.
        """
        inp_data = self.interpolate(fdata)

        if self._ft == 'fftlog':
            tdata = transforms.fourier_fftlog(
                inp_data, self.freq_required, self.time,
                signal=self.signal)
        else:
            tdata = transforms.fourier_dlf(
                inp_data, self.freq_required, self.time,
                signal=self.signal, filt=self._filt)

        return np.squeeze(tdata)

    # -- private -----------------------------------------------------------------

    def _check_time(self):
        """Compute required frequencies for the given times/ft/ftarg."""
        if self._ft not in ('dlf', 'sin', 'cos', 'fftlog'):
            raise ValueError(
                f"ft must be 'dlf' ('sin'/'cos' aliases) or 'fftlog'; "
                f"got '{self._ft}'.")

        if self._ft == 'fftlog':
            self._filt = None
            self._freq_req = transforms.required_frequencies_fftlog(
                self._time,
                pts_per_dec=self._ftarg.get('pts_per_dec', 10),
                add_dec=tuple(self._ftarg.get('add_dec', (-4, 2))))
        else:
            self._filt = self._ftarg.get('dlf', None)
            if self._filt is None or isinstance(self._filt, str):
                self._filt = transforms.design_filter()
            pts_per_dec = self._ftarg.get('pts_per_dec', -1)
            self._freq_req = transforms.required_frequencies(
                self._time, filt=self._filt, pts_per_dec=pts_per_dec)

        if self.verb > 2:
            self._print_freq_calc()

    def _check_coarse_inputs(self, keep_inp_freq=True):
        """input_freq and every_x_freq are mutually exclusive."""
        if self._input_freq is not None and self._every_x_freq is not None:
            msg = ("emg3d: `input_freq` and `every_x_freq` are mutually "
                   "exclusive. Re-setting ")
            if keep_inp_freq:
                msg += "`every_x_freq=None`."
                self._every_x_freq = None
            else:
                msg += "`input_freq=None`."
                self._input_freq = None
            warnings.warn(msg, UserWarning)

    def _print_freq_calc(self):
        """Print required and computed frequency ranges."""
        print(f"   Req. freq  [Hz] : {self.freq_required.min():.6g} - "
              f"{self.freq_required.max():.6g} "
              f"({self.freq_required.size})")
        print(f"   Calc. freq [Hz] : {self.freq_compute.min():.6g} - "
              f"{self.freq_compute.max():.6g} "
              f"({self.freq_compute.size})")
