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
