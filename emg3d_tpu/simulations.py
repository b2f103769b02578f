"""Simulation orchestration (placeholder — full implementation this round).

Rebuild target: reference emg3d/simulations.py:42-1748, with shard_map over
a (source, frequency) device axis replacing the process pool.
"""

__all__ = ["Simulation"]


class Simulation:
    """Placeholder; full Simulation implementation in progress."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError("Simulation lands later this round.")
