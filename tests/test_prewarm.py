"""Shape-journal prewarm plumbing (utils/prewarm.py): journal writes are
deduplicated, entries round-trip, replay dispatches registered warmers,
and everything no-ops on CPU backends / under LONGCALLD_NO_PREWARM."""

import json

import pytest

from longcalld_tpu.utils import prewarm


@pytest.fixture
def journal(tmp_path, monkeypatch):
    path = tmp_path / "cache" / "shape_journal.jsonl"
    monkeypatch.setattr(prewarm, "_journal_path", lambda: str(path))
    monkeypatch.setattr(prewarm, "_seen", set())
    monkeypatch.setattr(prewarm, "_started", False)
    monkeypatch.setattr(prewarm, "_warmers", {})
    # pretend we are on a device backend so record()/prewarm_async() run
    monkeypatch.setattr(prewarm, "_device_backend", True)
    return path


def test_record_dedups_and_roundtrips(journal):
    prewarm.record("align", n=64, B=256, Lp=1024)
    prewarm.record("align", n=64, B=256, Lp=1024)     # dup, not rewritten
    prewarm.record("align", B=256, n=64, Lp=1024)     # same after sort_keys
    prewarm.record("phase", R=512, V=512)
    lines = [json.loads(l) for l in open(journal)]
    assert len(lines) == 2
    assert {e["kind"] for e in lines} == {"align", "phase"}


def test_prewarm_replays_journal(journal):
    prewarm.record("phase", R=128, V=128)
    prewarm.record("mystery", x=1)                    # no warmer: ignored
    prewarm._seen.clear()                             # fresh "process"
    got = []
    prewarm.register_warmer("phase", lambda e: got.append(e))
    prewarm.prewarm_async(n_threads=2)
    import time
    for _ in range(100):
        if got:
            break
        time.sleep(0.02)
    assert got == [{"kind": "phase", "R": 128, "V": 128}]
    # entries loaded from the journal are marked seen: no duplicate append
    prewarm.record("phase", R=128, V=128)
    assert sum(1 for _ in open(journal)) == 2


def test_cpu_backend_never_journals(journal, monkeypatch):
    monkeypatch.setattr(prewarm, "_device_backend", False)
    prewarm.record("phase", R=64, V=64)
    assert not journal.exists()


def test_env_kill_switch(journal, monkeypatch):
    monkeypatch.setenv("LONGCALLD_NO_PREWARM", "1")
    called = []
    prewarm.register_warmer("phase", lambda e: called.append(e))
    prewarm.record("phase", R=64, V=64)
    prewarm.prewarm_async()
    import time
    time.sleep(0.1)
    assert called == []
