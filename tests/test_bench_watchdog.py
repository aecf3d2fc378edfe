"""bench.py device watchdog: a wedged tunnel must degrade, not hang, and
the reported status must distinguish an intentional caller cpu pin from a
real probe failure (with the probe's stderr tail on non-timeout errors)."""

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
    # an explicit CPU pin means "no device" without spawning anything,
    # and the status says so instead of claiming a tunnel failure
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    calls = []
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: calls.append(a) or None)
    ok, status = bench_mod._probe_device()
    assert ok is False
    assert calls == []
    assert "pinned by caller" in status


def test_probe_timeout_degrades(bench_mod, monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    def hang(*a, **k):
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=k["timeout"])

    monkeypatch.setattr(subprocess, "run", hang)
    ok, status = bench_mod._probe_device(timeout_s=0.01)
    assert ok is False
    assert "timed out" in status


def test_probe_subprocess_error_carries_stderr(bench_mod, monkeypatch):
    # a non-timeout probe failure (import error, OOM) is NOT attributed to
    # the tunnel: the status carries the subprocess's stderr tail
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    class R:
        returncode = 1
        stdout = ""
        stderr = "Traceback ...\nImportError: libfoo.so not found\n"

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: R())
    ok, status = bench_mod._probe_device()
    assert ok is False
    assert "rc=1" in status and "ImportError" in status


def test_probe_cpu_only_backend_is_not_a_device(bench_mod, monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    class R:
        returncode = 0
        stdout = "PLAT cpu\n"

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: R())
    ok, status = bench_mod._probe_device()
    assert ok is False
    assert "cpu backend" in status


def test_probe_live_tpu_passes(bench_mod, monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    class R:
        returncode = 0
        stdout = "PLAT axon\n"

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: R())
    ok, status = bench_mod._probe_device()
    assert ok is True
    assert status == "ok"
