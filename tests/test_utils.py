"""Tests for utils (reference tests/test_utils.py)."""

import time

import numpy as np
import pytest
from numpy.testing import assert_allclose

from emg3d_tpu import utils


class TestEMArray:

    def test_amp_pha(self):
        d = utils.EMArray([1 + 1j, 0 + 1j, -1 - 1j])
        assert isinstance(d, np.ndarray)
        assert_allclose(d.amp(), np.abs(d))
        # Lag convention (default): phase of the complex value.
        pha = d.pha(deg=True, unwrap=False)
        assert_allclose(pha, [45., 90., -135.])
        # Lead convention: conjugate phases.
        lead = d.pha(deg=True, unwrap=False, lag=False)
        assert_allclose(lead, [-45., -90., 135.])
        # Radians default.
        assert_allclose(d.pha(unwrap=False), np.deg2rad(pha))

    def test_unwrap(self):
        # Values crossing the -pi/pi line unwrap continuously.
        ang = np.linspace(0.1, 3 * np.pi, 20)
        d = utils.EMArray(np.exp(1j * ang))
        assert_allclose(d.pha(unwrap=True), ang, rtol=1e-12)


class TestTimer:

    def test_runtime(self):
        t = utils.Timer()
        time.sleep(0.05)
        assert t.elapsed >= 0.05
        assert ':' in t.runtime  # formatted H:MM:SS
        assert 'Timer' in repr(t) or ':' in repr(t)
        assert isinstance(t.now, str)


class TestReport:

    def test_contains_packages(self):
        rep = str(utils.Report())
        for name in ['numpy', 'scipy', 'jax']:
            assert name in rep


def test_known_class_registry():
    assert 'Model' in utils._KNOWN_CLASSES
    assert 'Survey' in utils._KNOWN_CLASSES
    assert 'Simulation' in utils._KNOWN_CLASSES
    assert 'TensorMesh' in utils._KNOWN_CLASSES
    assert 'Field' in utils._KNOWN_CLASSES


def test_requires_decorator():
    @utils._requires('nonexistent_package_xyz')
    def needs_it():
        return 1

    with pytest.warns(UserWarning, match='nonexistent_package_xyz'):
        out = needs_it()
    assert out is None
