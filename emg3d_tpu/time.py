"""Time-domain modelling via Fourier-DLF (placeholder — lands this round).

Rebuild target: reference emg3d/time.py:33-436, with native sine/cosine
digital linear filters (no empymod dependency).
"""

__all__ = ["Fourier"]


class Fourier:
    """Placeholder; full Fourier implementation in progress."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError("Fourier lands later this round.")
