"""Command-line interface (`emg3d-tpu` console entry point).

Rebuild of the reference CLI (emg3d/cli/): argparse front end over an
INI-style config file (`emg3d.cfg`) driving forward / misfit / gradient
batch runs of a Simulation, with load/save/cache resume.
"""

from emg3d_tpu.cli.main import main

__all__ = ['main']
