"""Backend health-probe / failure-window retry machinery.

These are logic tests (CPU): the probe is monkeypatched to simulate
failure windows; no real TPU tunnel is involved.
"""

import pytest

from emg3d_tpu import backend


def test_is_transient():
    assert backend.is_transient(RuntimeError("UNIMPLEMENTED: TPU x"))
    assert backend.is_transient(RuntimeError("UNAVAILABLE: conn"))
    assert backend.is_transient(RuntimeError("INTERNAL: rpc"))
    assert backend.is_transient(RuntimeError("DEADLINE_EXCEEDED"))
    assert not backend.is_transient(ValueError("shape mismatch"))
    assert not backend.is_transient(RuntimeError("NaN encountered"))


def test_probe_cpu_healthy():
    # On the CPU backend the probe must simply pass.
    assert backend.probe()


def test_wait_healthy_immediate():
    assert backend.wait_healthy("test") < 1.0


def test_wait_healthy_recovers(monkeypatch):
    calls = {"n": 0}

    def fake_probe():
        calls["n"] += 1
        return calls["n"] >= 3

    monkeypatch.setattr(backend, "probe", fake_probe)
    monkeypatch.setenv("EMG3D_TPU_PROBE_INTERVAL", "0.01")
    with pytest.warns(RuntimeWarning, match="failure window"):
        backend.wait_healthy("test")
    assert calls["n"] == 3


def test_wait_healthy_budget_exhausted(monkeypatch):
    monkeypatch.setattr(backend, "probe", lambda: False)
    monkeypatch.setenv("EMG3D_TPU_PROBE_INTERVAL", "0.01")
    with pytest.warns(RuntimeWarning):
        with pytest.raises(backend.HealthError, match="unhealthy"):
            backend.wait_healthy("test", budget=0.05)


def test_retry_transient_passthrough():
    assert backend.retry_transient(lambda: 42, "test") == 42


def test_retry_transient_nontransient_raises():
    def thunk():
        raise ValueError("real bug")

    with pytest.raises(ValueError, match="real bug"):
        backend.retry_transient(thunk, "test")


def test_retry_transient_recovers(monkeypatch):
    """Thunk fails twice with a transient error, then succeeds."""
    monkeypatch.setattr(backend, "probe", lambda: True)
    calls = {"n": 0}

    def thunk():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE: window")
        return "done"

    assert backend.retry_transient(thunk, "test") == "done"
    assert calls["n"] == 3


def test_retry_transient_rebuild_called(monkeypatch):
    """After a healthy probe + immediate re-failure, rebuild runs once."""
    monkeypatch.setattr(backend, "probe", lambda: True)
    state = {"rebuilt": False, "n": 0}

    def thunk():
        state["n"] += 1
        if not state["rebuilt"]:
            raise RuntimeError("UNIMPLEMENTED: dead state")
        return "ok"

    def rebuild():
        state["rebuilt"] = True

    assert backend.retry_transient(thunk, "test", rebuild=rebuild) == "ok"


def test_wait_healthy_born_bad_fast_path(monkeypatch):
    """Never-healthy process: give up after 3 probes, not the budget."""
    monkeypatch.setattr(backend, "probe", lambda: False)
    monkeypatch.setattr(backend, "_was_healthy", False)
    monkeypatch.setenv("EMG3D_TPU_PROBE_INTERVAL", "0.01")
    import time
    t0 = time.monotonic()
    with pytest.warns(RuntimeWarning):
        with pytest.raises(backend.HealthError, match="since process"):
            backend.wait_healthy("test", budget=60.0)
    assert time.monotonic() - t0 < 5.0


def test_wait_healthy_blip_waits_full_budget(monkeypatch):
    """Previously-healthy process: keep waiting past 3 failed probes."""
    calls = {"n": 0}

    def fake_probe():
        calls["n"] += 1
        return calls["n"] >= 6

    monkeypatch.setattr(backend, "probe", fake_probe)
    monkeypatch.setattr(backend, "_was_healthy", True)
    monkeypatch.setenv("EMG3D_TPU_PROBE_INTERVAL", "0.01")
    with pytest.warns(RuntimeWarning):
        backend.wait_healthy("test", budget=60.0)
    assert calls["n"] == 6


def test_reexec_counter_limit(monkeypatch):
    monkeypatch.setattr(backend, "probe", lambda: False)
    monkeypatch.setenv("EMG3D_TPU_REEXEC_N", "20")
    monkeypatch.setenv("EMG3D_TPU_REEXEC", "20")
    with pytest.raises(backend.HealthError, match="born"):
        backend.reexec_if_born_bad()


def test_reexec_noop_when_healthy(monkeypatch):
    monkeypatch.setattr(backend, "probe", lambda: True)
    monkeypatch.setenv("EMG3D_TPU_REEXEC_N", "3")
    assert backend.reexec_if_born_bad() == 3


def test_retry_transient_budget(monkeypatch):
    """Unrecoverable transient failure raises after the budget."""
    monkeypatch.setattr(backend, "probe", lambda: False)
    monkeypatch.setenv("EMG3D_TPU_PROBE_INTERVAL", "0.01")
    monkeypatch.setenv("EMG3D_TPU_MAX_WAIT", "0.05")

    def thunk():
        raise RuntimeError("UNAVAILABLE: forever")

    with pytest.warns(RuntimeWarning):
        with pytest.raises(RuntimeError, match="UNAVAILABLE"):
            backend.retry_transient(thunk, "test")


def test_compilation_cache_stays_off_on_cpu():
    """The persistent cache must NOT be enabled on XLA:CPU (segfaults
    while (de)serializing executables — see backend docstring)."""
    import jax
    from emg3d_tpu import backend
    assert jax.default_backend() == 'cpu'
    assert backend.enable_compilation_cache() is False
    assert jax.config.jax_compilation_cache_dir is None


def test_probe_timed_hang_is_unhealthy(monkeypatch):
    """A probe that HANGS (bad channels can block D2H reads
    indefinitely, not just fail them) must report unhealthy within the
    wall-clock bound instead of blocking the caller forever."""
    import time as _time

    def hung_probe():
        _time.sleep(60)
        return True

    monkeypatch.setattr(backend, "probe", hung_probe)
    t0 = _time.monotonic()
    assert backend.probe_timed(0.2) is False
    assert _time.monotonic() - t0 < 5

    monkeypatch.setattr(backend, "probe", lambda: True)
    assert backend.probe_timed(5.0) is True
