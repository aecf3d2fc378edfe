"""bench.py device watchdog: a wedged tunnel must degrade, not hang."""

import importlib.util
import os
import subprocess

import pytest


@pytest.fixture()
def bench_mod():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_probe_respects_cpu_pin(bench_mod, monkeypatch):
    # an explicit CPU pin means "no device" without spawning anything
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    calls = []
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: calls.append(a) or None)
    assert bench_mod._probe_device() is False
    assert calls == []


def test_probe_timeout_degrades(bench_mod, monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    def hang(*a, **k):
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=k["timeout"])

    monkeypatch.setattr(subprocess, "run", hang)
    assert bench_mod._probe_device(timeout_s=0.01) is False


def test_probe_cpu_only_backend_is_not_a_device(bench_mod, monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    class R:
        returncode = 0
        stdout = "PLAT cpu\n"

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: R())
    assert bench_mod._probe_device() is False


def test_probe_live_tpu_passes(bench_mod, monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    class R:
        returncode = 0
        stdout = "PLAT axon\n"

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: R())
    assert bench_mod._probe_device() is True
