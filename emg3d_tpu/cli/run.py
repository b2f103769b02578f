"""CLI execution: drive a Simulation from config + terminal arguments.

Reference: emg3d/cli/run.py:32-284.
"""

import json
import logging
import os
import sys
import time

import numpy as np

from emg3d_tpu import io, models, simulations, utils
from emg3d_tpu.cli import parser

__all__ = ['simulation']


def simulation(args_dict):
    """Run a forward/misfit/gradient batch job from the CLI."""
    runtime = utils.Timer()

    cfg, term = parser.parse_config_file(args_dict)
    check_files(cfg, term)
    function, verb = term['function'], term['verbosity']
    dry_run = term.get('dry_run', False)

    logger = initiate_logger(cfg, runtime, verb)

    from emg3d_tpu import __version__
    logger.info(f":: emg3d-tpu CLI {function} START :: {time.asctime()} "
                f":: v{__version__}")
    logger.debug(f"{utils.Report()}")

    paramdump = json.dumps(cfg, sort_keys=True, indent=4, default=str)
    logger.debug("\n    :: CONFIGURATION ::\n")
    logger.debug(f"{term['config_file']}\n{paramdump}")

    if cfg['files']['load']:
        logger.info("\n    :: LOAD SIMULATION ::\n")

        sim, sinfo = simulations.Simulation.from_file(
            cfg['files']['load'], verb=-1)
        logger.info(sinfo.split('\n')[0])
        logger.debug(sinfo.split('\n')[1])

        if term['clean']:
            logger.info("\n    :: CLEAN DATA AND REPLACE MODEL ::\n")
            sim.clean('computed')
            model, minfo = io.load(cfg['files']['model'], verb=-1)
            logger.info(minfo.split('\n')[0])
            logger.debug(minfo.split('\n')[1])
            sim.model = model['model']

            gopts = cfg['simulation_options'].get('gridding_opts', {})
            expand = gopts.pop('expand', None)
            if expand is not None:
                interface = gopts.pop('seasurface', 0.0)
                sim.model = models.expand_grid_model(
                    sim.model, expand, interface)

        layered = cfg['simulation_options'].get('layered', False)
        if sim.layered != layered:
            logger.info(f"Change «layered» of simulation to {layered}.")
            sim.layered = layered

    else:
        logger.info("\n    :: LOAD SURVEY AND MODEL ::\n")
        sdata, sinfo = io.load(cfg['files']['survey'], verb=-1)
        survey = sdata['survey']
        logger.info(sinfo.split('\n')[0])
        logger.debug(sinfo.split('\n')[1])
        model, minfo = io.load(cfg['files']['model'], verb=-1)
        logger.info(minfo.split('\n')[0])
        logger.debug(minfo.split('\n')[1])

        data = cfg['data']
        if data:
            survey = survey.select(
                sources=data.get('sources', None),
                receivers=data.get('receivers', None),
                frequencies=data.get('frequencies', None),
                remove_empty=data.get('remove_empty', False))

        if verb < 1:
            cfg['simulation_options']['tqdm_opts'] = False

        sim = simulations.Simulation(
            survey=survey, model=model['model'], verb=-1,
            **cfg['simulation_options'])

    logger.info("\n    :: SIMULATION ::")
    logger.info(f"\n{sim}\n")

    logger.debug("    :: MESHES ::\n")
    logger.debug(sim.print_grid_info(return_info=True))

    output = {'configuration': cfg}

    logger.info("    :: FORWARD COMPUTATION ::\n")
    if dry_run:
        output['data'] = np.zeros(sim.survey.shape, dtype=complex)
    else:
        if function == 'forward':
            sim.compute(observed=True, **cfg['noise_kwargs'])
            output['data'] = np.asarray(sim.data.observed)
        else:
            sim.compute()
            output['data'] = np.asarray(sim.data.synthetic)

        if verb in [0, 1]:
            sim.print_solver_info('efield', 0)
        logger.debug(sim.print_solver_info('efield', 1, True))

    if function in ['misfit', 'gradient']:
        output['misfit'] = 0.0 if dry_run else sim.misfit
        output['n_observations'] = sim.survey.count

    if function == 'gradient':
        logger.info("\n    :: BACKWARD COMPUTATION ::\n")
        if dry_run:
            shape = sim.model.shape
            if sim.model.case in ['HTI', 'VTI']:
                shape = (2, *shape)
            elif sim.model.case == 'triaxial':
                shape = (3, *shape)
            output['gradient'] = np.zeros(shape)
        else:
            output['gradient'] = sim.gradient
            if verb in [0, 1]:
                sim.print_solver_info('bfield', 0)
            logger.debug(sim.print_solver_info('bfield', 1, True))

    logger.info("    :: SAVE RESULTS ::\n")
    if cfg['files']['save']:
        oinfo = sim.to_file(cfg['files']['save'], verb=-1)
        logger.info(oinfo.split('\n')[0])
        logger.debug(oinfo.split('\n')[1])
    oinfo = io.save(cfg['files']['output'], **output, verb=-1)
    logger.info(oinfo.split('\n')[0])
    logger.debug(oinfo.split('\n')[1])

    logger.info(f"\n:: emg3d-tpu CLI {function} END   :: {time.asctime()} "
                f":: runtime = {runtime.runtime}")


def check_files(cfg, term):
    """Ensure all paths and files exist; exit with errors otherwise."""
    error = ""

    fname = term['config_file']
    if not os.path.isfile(fname) and fname != '.':
        error += f"* ERROR   :: Config file not found: {fname}\n"

    files = {'Survey': 'survey', 'Model': 'model', 'Simulation': 'load'}
    for key, value in files.items():
        ffile = cfg['files'][value]
        # The loaded-simulation path does not need survey/model files.
        if cfg['files']['load'] and value in ('survey', 'model'):
            if value == 'model' and term.get('clean'):
                pass  # model needed for --clean
            else:
                continue
        if ffile and not os.path.isfile(ffile):
            error += f"* ERROR   :: {key} file not found: {ffile}\n"

    dname = os.path.split(cfg['files']['log'])[0]
    if not os.path.isdir(dname):
        error += f"* ERROR   :: Output directory does not exist: {dname}\n"
    if cfg['files']['save']:
        dname = os.path.split(cfg['files']['save'])[0]
        if not os.path.isdir(dname):
            error += (f"* ERROR   :: Output directory does not exist: "
                      f"{dname}\n")

    if len(error) > 10:
        sys.exit(error[:-1])


def initiate_logger(cfg, runtime, verb):
    """File (DEBUG) + console logger; warnings captured."""
    logger = logging.getLogger(__name__)
    logger.setLevel(logging.DEBUG)

    for h in logger.handlers[:]:
        if h.name in ['emg3d_fh', 'emg3d_ch']:
            logger.removeHandler(h)
        h.close()

    fh = logging.FileHandler(f"{cfg['files']['log']}", mode='w')
    fh.setLevel(logging.DEBUG)
    fh.setFormatter(logging.Formatter('{message}', style='{'))
    fh.set_name('emg3d_fh')
    logger.addHandler(fh)

    ch = logging.StreamHandler()
    ch.setLevel([40, 30, 20, 10][verb + 1])
    ch.setFormatter(logging.Formatter('{message}', style='{'))
    ch.set_name('emg3d_ch')
    logger.addHandler(ch)

    logging.captureWarnings(True)
    logger_warnings = logging.getLogger("py.warnings")
    logger_warnings.setLevel(logging.DEBUG)
    logger_warnings.addHandler(ch)
    logger_warnings.addHandler(fh)

    return logger
