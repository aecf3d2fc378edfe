"""build_bai: the in-framework samtools-index analog must produce an
index our BaiIndex reader accepts, with fetch()/windows_busy() results
equal to the index-less full-scan path on fuzzed BAMs."""

import os
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from util_bam import make_record, write_bam

from longcalld_tpu.io.bam import BamReader, build_bai


def _mk_bam(tmp, rng, n_reads, ref_len, indexed):
    recs = []
    for k in range(n_reads):
        start = int(rng.integers(0, ref_len - 400))
        L = int(rng.integers(120, 400))
        seq4 = rng.integers(0, 4, L).astype(np.uint8)
        recs.append((start, make_record(
            0, start, f"r{k:03d}", [[7, L]], seq4,
            np.full(L, 35, dtype=np.uint8), mapq=60,
            flag=16 if k % 3 == 0 else 0)))
    recs.sort(key=lambda r: r[0])
    path = os.path.join(tmp, "t.bam" if indexed else "t_noidx.bam")
    write_bam(path, ["c1"], [ref_len], [r[1] for r in recs])
    if indexed:
        build_bai(path)
    return path


@pytest.mark.parametrize("seed", range(5))
def test_indexed_fetch_equals_full_scan(seed):
    rng = np.random.default_rng(seed)
    ref_len = 200_000
    with tempfile.TemporaryDirectory() as tmp:
        a = _mk_bam(tmp, np.random.default_rng(seed), 60, ref_len, True)
        b = _mk_bam(tmp, np.random.default_rng(seed), 60, ref_len, False)
        ra, rb = BamReader(a), BamReader(b)
        assert ra.index is not None and rb.index is None
        for _ in range(40):
            beg = int(rng.integers(0, ref_len))
            end = beg + int(rng.integers(1, 30_000))
            ka = [(r.pos, r.flag, r.qname) for r in ra.fetch(0, beg, end)]
            kb = [(r.pos, r.flag, r.qname) for r in rb.fetch(0, beg, end)]
            assert ka == kb, (beg, end)
        # busy_mask: may only over-approximate, never claim busy empty
        begs = np.arange(0, ref_len, 4096, dtype=np.int64)
        ends = begs + 4096
        busy = ra.windows_busy(0, begs, ends)
        for k in range(len(begs)):
            has = len(rb.fetch(0, int(begs[k]), int(ends[k]))) > 0
            if has:
                assert busy[k], f"index claimed empty at {begs[k]}"


def test_empty_and_sparse_refs():
    with tempfile.TemporaryDirectory() as tmp:
        rng = np.random.default_rng(0)
        L = 150
        seq4 = rng.integers(0, 4, L).astype(np.uint8)
        rec = make_record(1, 50_000, "only", [[7, L]], seq4,
                          np.full(L, 30, dtype=np.uint8))
        path = os.path.join(tmp, "s.bam")
        write_bam(path, ["c0", "c1", "c2"], [10_000, 100_000, 5_000],
                  [rec])
        build_bai(path)
        r = BamReader(path)
        assert r.index is not None
        assert [x.qname for x in r.fetch(1, 49_000, 51_000)] == ["only"]
        assert r.fetch(0, 0, 10_000) == []
        assert r.fetch(2, 0, 5_000) == []
        assert r.window_certainly_empty(0, 0, 10_000)
        assert not r.window_certainly_empty(1, 49_000, 51_000)
