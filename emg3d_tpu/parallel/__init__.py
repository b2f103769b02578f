"""Device-parallel execution: batched multi-source/multi-frequency solves.

TPU-native replacement for the reference's per-(source, frequency)
process-pool parallelism (emg3d/_multiprocessing.py:33-153): tasks are
batched into a leading device axis, vmapped through the same multigrid
kernels, and sharded over a ``jax.sharding.Mesh`` axis — embarrassingly
parallel, so XLA partitions without inserting any collectives (the
analogue of the reference's zero inter-process communication).
"""

from emg3d_tpu.parallel.batch import solve_batch, make_task_mesh

__all__ = ["solve_batch", "make_task_mesh"]
