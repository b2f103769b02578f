"""Domain-decomposed (grid-sharded) solves over a device mesh.

The reference has exactly one parallelism strategy: one process per
(source, frequency) task (emg3d/_multiprocessing.py:33-69).  Its grids
always fit one CPU's RAM.  On TPU the per-chip HBM bounds the grid
size instead, so the TPU-native scaling axis for a SINGLE large solve
is sharding the 3-D grid itself across chips (the sequence-parallel
analogue noted in SURVEY §2.3/§5).

Design: GSPMD, not hand-written halo exchange.  Every multigrid level
op (residual, multicolor smoothing phases, restriction, prolongation)
is a 1-point-halo stencil or a factor-2 re-gridding — patterns XLA's
SPMD partitioner handles by inserting the minimal collective-permute
halo exchanges on ICI.  We therefore only *place* data:

- the grid is sharded over the trailing two axes (y, z) of a 2-D
  ``Mesh``; the x-axis stays local so x-line relaxation's block-Thomas
  scan never crosses devices;
- each multigrid level keeps the fine sharding while its local block
  stays usefully large, then falls back to full replication (coarse
  grids are latency-bound; replicating them makes the coarse solve
  collective-free);
- all 1-D width arrays and transfer weights are replicated.

The host-driven cycle loop of :mod:`emg3d_tpu.solver` is unchanged:
jitted level ops inherit shardings from their inputs, and XLA inserts
the resharding (all-gather) at the sharded->replicated level boundary.
"""

import functools

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_grid_mesh", "GridPlacement"]


def __dir__():
    return __all__


@functools.partial(jax.jit, static_argnames=("sh",))
def _place_jit(a, sh):
    return jax.lax.with_sharding_constraint(a, sh)


def make_grid_mesh(n_devices=None, axes=("gy", "gz")):
    """A 2-D device mesh for grid sharding over the (y, z) axes.

    Factors ``n_devices`` (default: all) as close to square as
    possible; e.g. 8 -> (4, 2).  A near-square factorization keeps the
    per-shard surface (= halo traffic) minimal for a given volume.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    a = int(np.floor(np.sqrt(n)))
    while n % a:
        a -= 1
    return Mesh(np.array(devs).reshape(n // a, a), axes)


class GridPlacement:
    """Per-level sharding plan + placement helpers for one hierarchy.

    ``min_local``: keep a level sharded only while every device's local
    block is at least this many cells along each sharded axis (below
    that, halo traffic dominates and the level is replicated).
    """

    def __init__(self, mesh, min_local=4):
        self.mesh = mesh
        self.min_local = int(min_local)
        ay, az = mesh.axis_names
        self._sharded = NamedSharding(mesh, P(None, ay, az))
        self._replicated = NamedSharding(mesh, P())

    def spec(self, shape_cells):
        """The sharding for 3-D arrays of a level with ``shape_cells``."""
        ny, nz = int(shape_cells[1]), int(shape_cells[2])
        sy, sz = self.mesh.devices.shape
        if ny // sy >= self.min_local and nz // sz >= self.min_local:
            return self._sharded
        return self._replicated

    def _put(self, a, sh):
        # Edge/node-indexed arrays have n+1 sizes, rarely divisible by
        # the mesh axes.  device_put rejects uneven shardings, but a
        # with_sharding_constraint inside jit accepts them (GSPMD pads
        # internally), so placement goes through a jitted identity.
        if a is None:
            return None
        return _place_jit(jax.numpy.asarray(a), sh)

    def place_level(self, lvl_arrays, shape_cells):
        """Place one level's array dict according to the plan.

        3-D model-parameter arrays follow the level spec; 1-D axis
        arrays and transfer metadata are replicated everywhere.
        """
        sh3 = self.spec(shape_cells)
        rep = self._replicated
        out = {}
        for k, v in lvl_arrays.items():
            if k in ("rw", "pm"):
                out[k] = jax.tree_util.tree_map(
                    lambda x: self._put(x, rep), v,
                    is_leaf=lambda x: x is None)
            elif getattr(v, "ndim", 0) == 3:
                out[k] = self._put(v, sh3)
            else:
                out[k] = self._put(v, rep)
        return out

    def place_field(self, e, shape_cells):
        """Place an edge-field tuple with the level's sharding."""
        sh = self.spec(shape_cells)
        return tuple(self._put(c, sh) for c in e)
