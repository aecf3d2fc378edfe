"""Vectorized BAI busy-window mask vs the per-window index query it
replaces (the whole-genome empty-window skip,
/root/reference/src/bam_utils.c:1673-1706 reads sequentially so empties
are naturally free there)."""

import numpy as np
import pytest

from longcalld_tpu.io.bam import BamReader


def test_busy_mask_conservative_vs_query_chunks(hifi_bam):
    """The mask may keep a window the per-window query would prove empty
    (bin-granular), but must NEVER drop a window that has chunks."""
    bam = BamReader(hifi_bam)
    tid = bam.name2tid("chr11")
    step = 37_000  # deliberately unaligned to the 16 kb tile grid
    begs = np.arange(0, 3_000_000, step, dtype=np.int64)
    ends = begs + step
    mask = bam.windows_busy(tid, begs, ends)
    for k in range(len(begs)):
        per_window = not bam.window_certainly_empty(
            tid, int(begs[k]), int(ends[k]))
        if per_window:
            assert mask[k], f"mask dropped busy window {begs[k]}"
    # and the mask finds the read span busy
    assert mask[(begs >= 1_200_000) & (ends <= 1_440_000)].all()


def test_busy_mask_matches_fetch(hifi_bam):
    """Ground truth: any window with actual records must be busy."""
    bam = BamReader(hifi_bam)
    tid = bam.name2tid("chr11")
    begs = np.arange(1_100_000, 1_600_000, 10_000, dtype=np.int64)
    ends = begs + 10_000
    mask = bam.windows_busy(tid, begs, ends)
    for k in range(len(begs)):
        has_reads = len(bam.fetch(tid, int(begs[k]), int(ends[k]))) > 0
        if has_reads:
            assert mask[k]


def test_busy_mask_empty_contig(hifi_bam):
    bam = BamReader(hifi_bam)
    tid = bam.name2tid("chr1")
    begs = np.arange(0, 1_000_000, 100_000, dtype=np.int64)
    assert not bam.windows_busy(tid, begs, begs + 100_000).any()


def test_busy_mask_bad_tid(hifi_bam):
    bam = BamReader(hifi_bam)
    begs = np.array([0], dtype=np.int64)
    assert not bam.windows_busy(10**6, begs, begs + 100).any()
