"""Logger levels + stage counters (utils/log.py, utils/counters.py)."""

import re
import threading

from longcalld_tpu.utils import counters, log


def test_debug_gated_by_verbosity(capsys):
    log.set_verbose(0)
    log.debug(1, "t", "hidden")
    assert "hidden" not in capsys.readouterr().err
    log.set_verbose(2)
    try:
        log.debug(1, "t", "shown-1")
        log.debug(2, "t", "shown-2")
        log.debug(3, "t", "not-shown")
        err = capsys.readouterr().err
        assert "shown-1" in err and "shown-2" in err
        assert "not-shown" not in err
        assert re.search(r"\[D(\x1b\[0m)?::\d\d:\d\d:\d\d::t\]", err)
    finally:
        log.set_verbose(0)


def test_exit_summary_format(capsys):
    log.exit_summary("prog")
    err = capsys.readouterr().err
    assert re.search(r"Real time: \d+\.\d{3} sec; CPU: \d+\.\d{3} sec; "
                     r"Peak RSS: \d+\.\d{3} GB", err)


def test_counters_thread_safety():
    counters.reset()
    def work():
        for _ in range(1000):
            counters.inc("n")
            counters.add_time("s", 0.001)
    ts = [threading.Thread(target=work) for _ in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    lines = counters.summary_lines()
    assert any(l.startswith("count n: 8000") for l in lines)
    assert any(l.startswith("stage s: 8.000 s over 8000 calls")
               for l in lines)
    counters.reset()
    assert counters.summary_lines() == []


def test_profile_flag_writes_trace(tmp_path, capsys):
    """--profile DIR produces a jax.profiler trace directory."""
    import os

    from longcalld_tpu import cli

    ref = "/root/reference/test_data/chr11_2M.fa"
    bam = "/root/reference/test_data/HG002_chr11_hifi_test.bam"
    if not os.path.exists(bam):
        import pytest
        pytest.skip("test data missing")
    prof = str(tmp_path / "prof")
    rc = cli.main(["call", ref, bam, "--hifi",
                   "-r", "chr11:1240000-1250000",
                   "-o", str(tmp_path / "o.vcf"),
                   "--profile", prof])
    assert rc == 0
    found = []
    for _root, _dirs, files in os.walk(prof):
        found.extend(files)
    assert found, "no profiler artifacts written"
