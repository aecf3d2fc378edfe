"""Cost-balanced range planning + LPT scheduling (pipeline._plan_ranges)
and index-aware window planning (windows.plan_windows busy_fn).

The procs path's wall is set by its worst range, so the planner must (a)
isolate hot windows into their own ranges using the BAM index's byte
volumes, (b) dispatch heaviest-first while yielding in stream order, and
(c) keep reg_i at the UNFILTERED numbering when empty windows are dropped
pre-construction — stitch identity depends on it.
"""

import io

import numpy as np

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core import pipeline as pl
from longcalld_tpu.core.windows import plan_windows


class _FakeIdx:
    def __init__(self, vol_by_key):
        self.vol = vol_by_key

    def window_volumes(self, tid, begs0, ends):
        return np.array([self.vol.get((tid, int(b)), 0) for b in begs0],
                        dtype=np.int64)


class _FakeBam:
    def __init__(self, vol_by_key):
        self.index = _FakeIdx(vol_by_key)


class _W:
    def __init__(self, tid, beg, end, chunk_i, reg_i):
        self.tid, self.beg, self.end = tid, beg, end
        self.chunk_i, self.reg_i = chunk_i, reg_i


def test_plan_ranges_isolates_hot_window_and_orders_lpt():
    # 8 windows; window 5 holds ~90% of the indexed bytes
    vols = {(0, k * 100): (9000 if k == 5 else 100) for k in range(8)}
    wins = [_W(0, k * 100 + 1, (k + 1) * 100, 0, k) for k in range(8)]
    ranges, order = pl._plan_ranges(wins, n_workers=2, bams=[_FakeBam(vols)])
    # ranges tile the stream in order
    assert ranges[0][0] == 0
    for (a, ca), (b, cb) in zip(ranges, ranges[1:]):
        assert b == a + ca
    assert sum(c for _, c in ranges) == len(wins)
    # the hot window is alone in its range
    hot = [r for r in ranges if r[0] <= 5 < r[0] + r[1]]
    assert hot == [(5, 1)]
    # and scheduled first
    assert order is not None and ranges[order[0]] == (5, 1)


def test_plan_ranges_falls_back_without_index():
    wins = [_W(0, k * 100 + 1, (k + 1) * 100, 0, k) for k in range(9)]

    class _NoIdxBam:
        index = None

    ranges, order = pl._plan_ranges(wins, n_workers=2, bams=[_NoIdxBam()])
    assert order is None
    assert sum(c for _, c in ranges) == len(wins)
    assert len(ranges) <= 8


def test_plan_windows_busy_fn_keeps_unfiltered_reg_i(chr11_fa, hifi_bam):
    from longcalld_tpu.core.pipeline import _open_aln

    bam = _open_aln(hifi_bam, chr11_fa)
    opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[hifi_bam])

    def busy(tid, begs0, ends):
        m = np.zeros(len(begs0), dtype=bool)
        m |= np.asarray(bam.windows_busy(tid, begs0, ends), dtype=bool)
        return m

    full = plan_windows(opt, bam.references, bam.lengths, max_reg_len=50_000)
    filt = plan_windows(opt, bam.references, bam.lengths, max_reg_len=50_000,
                        busy_fn=busy)
    assert 0 < len(filt) < len(full)
    # every kept window is bit-identical to its unfiltered counterpart
    by_key = {(w.tid, w.beg): w for w in full}
    for w in filt:
        ref = by_key[(w.tid, w.beg)]
        assert (w.end, w.chunk_i, w.reg_i) == (ref.end, ref.chunk_i,
                                               ref.reg_i)
    # the kept set is exactly the busy set of the unfiltered plan
    keep = {(w.tid, w.beg) for w in filt}
    for w in full:
        m = busy(w.tid, np.array([w.beg - 1]), np.array([w.end]))
        assert bool(m[0]) == ((w.tid, w.beg) in keep)


def test_procs_lpt_output_matches_sequential(chr11_fa, hifi_bam):
    """End-to-end: LPT-scheduled pool vs in-order single worker —
    identical VCF bytes (stitch votes run in the parent either way)."""
    from longcalld_tpu.core.pipeline import run_call

    base = dict(ref_fa_fn=chr11_fa, in_bam_fns=[hifi_bam],
                window_size=50_000, use_device=False)
    out1, out4 = io.StringIO(), io.StringIO()
    run_call(CallOpts.hifi(n_threads=1, host_procs=0, **base), out1, "t")
    run_call(CallOpts.hifi(n_threads=4, host_procs=4, **base), out4, "t")
    b1 = [l for l in out1.getvalue().splitlines() if not l.startswith("##")]
    b4 = [l for l in out4.getvalue().splitlines() if not l.startswith("##")]
    assert b1 == b4 and len(b1) > 100


def test_window_costs_cram_input(chr11_fa, hifi_bam, tmp_path):
    """CRAM inputs get cost-balanced scheduling too: the .crai adapter's
    volumes must peak on the same windows as the BAM index's."""
    from longcalld_tpu.core.pipeline import (_open_aln, _window_costs)
    from longcalld_tpu.io.bam import BamReader
    from longcalld_tpu.io.cram import CramWriter

    src = BamReader(hifi_bam)
    path = str(tmp_path / "sched.cram")
    w = CramWriter(path, src.header_text, list(src.references),
                   list(src.lengths), chr11_fa)
    for r in src:
        w.write_record(r)
    w.close()

    wins = [_W(0, k * 50_000 + 1, (k + 1) * 50_000, 0, k)
            for k in range(44)]
    bam_est = _window_costs([_open_aln(hifi_bam, chr11_fa)], wins)
    cram_est = _window_costs([_open_aln(path, chr11_fa)], wins)
    assert bam_est is not None and cram_est is not None
    assert int(np.argmax(bam_est)) == int(np.argmax(cram_est))
    hot = bam_est > bam_est.mean()
    assert (cram_est[hot] > cram_est[~hot].max()).all()


def test_imap_backpressure_bounds_backlog(monkeypatch):
    """A slow consumer must bound the completed-but-unyielded backlog at
    the cap, the stream must stay in order, and the smallest-index
    fallback must prevent deadlock even under a fully inverted execution
    order (procpool.imap_ranges round-5 backpressure)."""
    import threading
    import time

    from longcalld_tpu.core import procpool

    done = []
    yielded = []
    lock = threading.Lock()
    max_backlog = [0]

    class FakeWorker:
        def __init__(self, idx):
            self.idx = idx

        def run(self, ctx_id, ctx_msg, first_k, count):
            time.sleep(0.002)
            with lock:
                done.append(first_k)
                max_backlog[0] = max(max_backlog[0],
                                     len(done) - len(yielded))
            return ["r", first_k, count]

    monkeypatch.setattr(procpool, "_get_workers",
                        lambda n, fn=None: [FakeWorker(i) for i in range(n)])
    n_ranges = 60
    ranges = [(i, 1) for i in range(n_ranges)]
    # fully inverted priority: range 0 would run LAST without the
    # smallest-index fallback, and with a cap the workers would all park
    order = list(range(n_ranges))[::-1]
    out = []
    for payload in procpool.imap_ranges(None, None, ranges, 4, order=order,
                                        max_backlog=6):
        time.sleep(0.004)        # consumer slower than the pool
        with lock:
            yielded.append(payload[1])
        out.append(payload)
    assert [p[1] for p in out] == [i for i, _ in ranges]   # strict order
    # bound: cap + one in-flight range per worker
    assert max_backlog[0] <= 6 + 4, max_backlog[0]


def test_imap_backpressure_error_propagates(monkeypatch):
    """A worker exception inside the backpressure scheduler still reaches
    the consumer (and does not hang the stream)."""
    from longcalld_tpu.core import procpool

    class FakeWorker:
        idx = 0

        def run(self, ctx_id, ctx_msg, first_k, count):
            if first_k == 3:
                raise RuntimeError("boom-range-3")
            return [first_k]

    monkeypatch.setattr(procpool, "_get_workers",
                        lambda n, fn=None: [FakeWorker()])
    ranges = [(i, 1) for i in range(6)]
    got = []
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="boom-range-3"):
        for p in procpool.imap_ranges(None, None, ranges, 1):
            got.append(p[0])
    assert got == [0, 1, 2]
