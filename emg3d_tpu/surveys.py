"""Survey container (placeholder — full implementation lands this round).

Rebuild target: reference emg3d/surveys.py:41-1038 (numpy-backed data
container instead of xarray).
"""

__all__ = ["Survey"]


class Survey:
    """Placeholder; full Survey implementation in progress."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError("Survey lands later this round.")
