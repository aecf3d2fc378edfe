"""Exact-POA oracle vs production star-MSA on REAL HG002 noisy regions.

Round-3 review item 5: the brute-force POA oracle (tests/poa_oracle.py)
had only ever seen small synthetics; this file runs it against the
production consensus engine on actual noisy regions extracted from the
HG002 chr11 HiFi BAM — the same spans, read subsequences, cover flags,
haplotype subsets, and read ordering the production noisy-region driver
uses (core/consensus.collect_noisy_vars1; the behavior being approximated
is abPOA's graph DP, /root/reference/src/align.c:762-943).

Measured contract (full sweep of the window's eligible regions,
74 per-hap consensus calls, re-measured 2026-08 round 5):

* 89% of per-hap consensus calls equal the exact-POA oracle consensus
  byte for byte (asserted here at >= 80% over >= 20 regions);
* in EVERY divergent case the star consensus equals the MODAL read
  string of the subset — in 6/8 divergences that mode is a strict >=60%
  byte-identical majority of the reads, where any correct consensus
  (abPOA's included: a majority of identical reads is the heaviest path
  through any POA graph) must output exactly that string.  The oracle's
  column-majority extraction over its exact-POA rows never equals the
  mode, and in 5/8 cases its consensus has nearest-read edit distance
  >= 1, i.e. it would emit variants NO read supports.  Asserted: every
  divergence has star == modal-read-string and star nearest-read
  distance 0 — the strongest ground truth available without a buildable
  abPOA;
* an iterate-once re-vote pass (realign all reads to the consensus,
  re-vote columns) was measured and refuted: no-op on 73/74 calls,
  harmful on the one call it changes (see core/msa.py docstring);
* the >= 10 kb sampling-mode path (sort by cover/error-rate, read
  subsetting — /root/reference/src/align.c:955-987,1772-1774) is
  exercised on the largest real region by lowering the sampling
  threshold, with the explains-the-reads bound.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from longcalld_tpu import config
from longcalld_tpu.config import CallOpts
from longcalld_tpu.core import classify, phase, pipeline, profile
from longcalld_tpu.core.msa import star_msa
from longcalld_tpu.core.windows import plan_windows
from longcalld_tpu.io.bam import BamReader
from longcalld_tpu.io.fasta import FastaFile
from longcalld_tpu.ops.affine_align import align_affine2p

from poa_oracle import consensus_seq, poa_msa

REF = "/root/reference/test_data/chr11_2M.fa"
BAM = "/root/reference/test_data/HG002_chr11_hifi_test.bam"


def _drive(gen):
    send = None
    while True:
        try:
            pairs, la = gen.send(send)
        except StopIteration as e:
            return e.value
        flags = la if isinstance(la, (list, tuple)) else [la] * len(pairs)
        send = [align_affine2p(t, q, left_align=f)
                for (t, q), f in zip(pairs, flags)]


def _edit(a, b) -> int:
    a, b = np.asarray(a), np.asarray(b)
    prev = np.arange(len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = np.empty(len(b) + 1, dtype=np.int64)
        cur[0] = i
        sub = prev[:-1] + (b != a[i - 1])
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub[j - 1])
        prev = cur
    return int(prev[-1])


@pytest.fixture(scope="module")
def real_chunk():
    """The HG002 window carried through digars -> candidates ->
    classification -> phasing, stopping right before the noisy-region
    engine — exactly the state collect_noisy_vars1 sees."""
    opt = CallOpts.hifi(ref_fa_fn=REF, in_bam_fns=[BAM], use_device=False)
    fasta = FastaFile(REF)
    bams = [BamReader(BAM)]
    wins = plan_windows(opt, bams[0].references, bams[0].lengths,
                        max_reg_len=opt.window_size)
    wins = pipeline._filter_busy_windows(bams, wins)
    chunk = pipeline.load_chunk(opt, fasta, bams, wins[0], None, None)
    pipeline.collect_digars(opt, chunk)
    from longcalld_tpu.core.sites import (collect_all_cand_var_sites,
                                          collect_cand_vars_fast,
                                          collect_cand_vars_native)
    sites = collect_all_cand_var_sites(opt, chunk.digars, chunk.order,
                                       chunk.reg_beg, chunk.reg_end)
    cand = collect_cand_vars_native(opt, sites, chunk.digars, chunk.order)
    chunk.cand_vars = (cand if cand is not None else
                       collect_cand_vars_fast(opt, sites, chunk.digars,
                                              chunk.order))
    classify.pre_process_noisy_regs(chunk, opt)
    classify.classify_cand_vars(chunk, opt)
    chunk.haps = np.zeros(chunk.n_reads, dtype=np.int8)
    chunk.phase_sets = np.full(chunk.n_reads, -1, dtype=np.int64)
    chunk.n_clean_agree_snps = np.zeros(chunk.n_reads, dtype=np.int32)
    chunk.n_clean_conflict_snps = np.zeros(chunk.n_reads, dtype=np.int32)
    chunk.is_skipped_for_somatic = np.zeros(chunk.n_reads, dtype=np.uint8)
    profile.collect_read_var_profile(opt, chunk)
    phase.assign_haplotypes(opt, chunk,
                            config.CLEAN_HET_SNP | config.CLEAN_HET_INDEL
                            | config.CLEAN_HOM_VAR)
    return opt, chunk


def _region_spans(chunk, max_len):
    regs = chunk.noisy_regs
    out = []
    for r in range(len(regs)):
        rb = max(int(regs.starts[r]), chunk.ref_beg)
        re_ = min(int(regs.ends[r]), chunk.ref_end)
        if re_ - rb + 1 <= max_len:
            out.append((r, rb, re_))
    return out


def _hap_subsets(opt, chunk, rb, re_, max_reads=10):
    """Production read gathering + per-hap subsetting for one region
    (collect_noisy_vars1's phased branch)."""
    from longcalld_tpu.core.consensus import (collect_noisy_read_info,
                                              phase_set_with_both_haps,
                                              sort_noisy_reads)
    read_ids = [ri for ri in chunk.order
                if chunk.digars[ri] is not None
                and not (chunk.digars[ri].beg > re_
                         or chunk.digars[ri].end <= rb)]
    if not (4 <= len(read_ids) <= 30):
        return []
    info = collect_noisy_read_info(opt, chunk, rb, re_, read_ids)
    sort_noisy_reads(info, False)
    ps = phase_set_with_both_haps(info, opt.min_hap_full_reads,
                                  opt.min_hap_reads)
    if ps <= 0:
        return []
    subsets = []
    for hap in (1, 2):
        sel = [i for i in range(len(info.lens))
               if info.lens[i] > 0 and info.phase_sets[i] == ps
               and info.haps[i] == hap][:max_reads]
        if len(sel) >= 2:
            subsets.append((hap,
                            [np.asarray(info.seqs[i], dtype=np.uint8)
                             for i in sel],
                            [int(info.covers[i]) for i in sel]))
    return subsets


def _compare(opt, seqs, covers, sampling=False):
    """Returns (exact_equal, star_mean_read_dist, oracle_mean_read_dist)."""
    res = _drive(star_msa(opt, seqs, covers, 1, sampling))
    if res is None or res.n_cons < 1:
        return None
    orc = consensus_seq(poa_msa(seqs).msa_rows())
    star = res.cons_seqs[0]
    if len(star) == len(orc) and np.array_equal(star, orc):
        return (True, 0.0, 0.0)
    sd = float(np.mean([_edit(star, s) for s in seqs]))
    od = float(np.mean([_edit(orc, s) for s in seqs]))
    return (False, sd, od)


def test_real_regions_match_or_beat_oracle(real_chunk):
    from collections import Counter
    opt, chunk = real_chunk
    spans = _region_spans(chunk, max_len=700)
    n_regions = 0
    n_calls = 0
    n_exact = 0
    divergent = []
    for r, rb, re_ in spans:
        subsets = _hap_subsets(opt, chunk, rb, re_)
        if not subsets:
            continue
        n_regions += 1
        for hap, seqs, covers in subsets:
            res = _drive(star_msa(opt, seqs, covers, 1, False))
            if res is None or res.n_cons < 1:
                continue
            n_calls += 1
            orc = consensus_seq(poa_msa(seqs).msa_rows())
            star = res.cons_seqs[0]
            if len(star) == len(orc) and np.array_equal(star, orc):
                n_exact += 1
                continue
            divergent.append((r, hap))
            # ground truth on every divergence: the star consensus IS the
            # modal read string (measured: a strict >=60% byte-identical
            # majority in 6/8 divergences — the heaviest path through ANY
            # POA graph of such a subset is that exact string), and its
            # nearest-read distance is 0.  The oracle's column-majority
            # extraction fragments here and in most cases emits a
            # consensus no read supports.
            mode_s, _mode_n = Counter(
                s.tobytes() for s in seqs).most_common(1)[0]
            assert star.tobytes() == mode_s, (r, hap)
            assert min(_edit(star, s) for s in seqs) == 0, (r, hap)
    assert n_regions >= 20, f"only {n_regions} real regions compared"
    assert n_calls >= 30, f"only {n_calls} consensus calls compared"
    assert n_exact / n_calls >= 0.80, (
        f"exact-match rate {n_exact}/{n_calls} below the measured 89% "
        f"contract; divergent: {divergent}")


def test_sampling_mode_on_largest_real_region(real_chunk):
    """The >= 10 kb sampling-mode path (read sorting by cover/error-rate +
    subsetting) on the largest real region, engaged by lowering the
    threshold below the region's length; same explains-the-reads bound."""
    opt, chunk = real_chunk
    regs = chunk.noisy_regs
    sizes = sorted(
        ((min(int(regs.ends[r]), chunk.ref_end)
          - max(int(regs.starts[r]), chunk.ref_beg) + 1, r)
         for r in range(len(regs))), reverse=True)
    tested = 0
    for L, r in sizes[:10]:
        rb = max(int(regs.starts[r]), chunk.ref_beg)
        re_ = min(int(regs.ends[r]), chunk.ref_end)
        # crop very large spans so the exact oracle stays feasible; the
        # cropped span is still real read data over a real noisy interval
        re_ = min(re_, rb + 1199)
        subsets = _hap_subsets(opt, chunk, rb, re_, max_reads=8)
        for hap, seqs, covers in subsets[:2]:
            out = _compare(opt, seqs, covers, sampling=True)
            if out is None:
                continue
            tested += 1
            eq, sd, od = out
            assert eq or sd <= od + 0.5, (r, hap, sd, od)
        if tested >= 4:
            break
    assert tested >= 2, "sampling-mode comparison found too few regions"
