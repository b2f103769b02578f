"""emg3d_tpu: TPU-native multigrid solver for 3-D EM diffusion (CSEM).

A ground-up rebuild of emsig/emg3d on JAX/XLA for TPU hardware: Pallas/XLA
stencil kernels and batched block solves replace the numba CPU kernels;
multigrid cycles run as single jitted programs; surveys fan out over device
meshes instead of process pools.

Top-level API mirrors the reference (emg3d/__init__.py:18-33).
"""

from emg3d_tpu.electrodes import (
    TxElectricDipole, TxMagneticDipole, TxElectricWire, TxElectricPoint,
    TxMagneticPoint, RxElectricPoint, RxMagneticPoint,
)
from emg3d_tpu.fields import Field, get_source_field, get_magnetic_field
from emg3d_tpu.io import save, load, convert
from emg3d_tpu.meshes import TensorMesh, construct_mesh
from emg3d_tpu.models import Model
from emg3d_tpu.simulations import Simulation
from emg3d_tpu.solver import solve, solve_source
from emg3d_tpu.surveys import Survey
from emg3d_tpu.time import Fourier
from emg3d_tpu.utils import Report

try:
    from emg3d_tpu.version import __version__
except ImportError:
    __version__ = "0.1.0"

__all__ = [
    'TxElectricDipole', 'TxMagneticDipole', 'TxElectricWire',
    'TxElectricPoint', 'TxMagneticPoint', 'RxElectricPoint',
    'RxMagneticPoint', 'Field', 'get_source_field', 'get_magnetic_field',
    'save', 'load', 'convert', 'TensorMesh', 'construct_mesh', 'Model',
    'Simulation', 'solve', 'solve_source', 'Survey', 'Fourier', 'Report',
]
