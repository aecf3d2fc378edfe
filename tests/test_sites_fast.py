"""Vectorized pileup fast path vs the sequential reference implementation."""


from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import load_chunk, collect_digars
from longcalld_tpu.core.sites import (collect_all_cand_var_sites,
                                      collect_cand_vars,
                                      collect_cand_vars_fast)
from longcalld_tpu.core.windows import plan_windows
from longcalld_tpu.io.bam import BamReader
from longcalld_tpu.io.fasta import FastaFile


def test_fast_pileup_equals_sequential(chr11_fa, hifi_bam):
    opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[hifi_bam])
    fasta = FastaFile(chr11_fa)
    bam = BamReader(hifi_bam)
    wins = plan_windows(opt, bam.references, bam.lengths)
    win = [w for w in wins if w.tname == "chr11" and w.beg == 1000001][0]
    chunk = load_chunk(opt, fasta, [bam], win, None, None)
    collect_digars(opt, chunk)
    sites = collect_all_cand_var_sites(opt, chunk.digars, chunk.order,
                                      chunk.reg_beg, chunk.reg_end)
    assert len(sites) > 1000
    slow = collect_cand_vars(opt, sites, chunk.digars, chunk.order)
    fast = collect_cand_vars_fast(opt, sites, chunk.digars, chunk.order)
    assert (slow.total_cov == fast.total_cov).all()
    assert (slow.low_qual_cov == fast.low_qual_cov).all()
    assert (slow.alle_covs == fast.alle_covs).all()
    assert (slow.strand_covs == fast.strand_covs).all()


def test_native_pileup_equals_sequential(chr11_fa, hifi_bam):
    """The C two-pointer == the Python sequential oracle on real data."""
    from longcalld_tpu.core.sites import collect_cand_vars_native
    opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[hifi_bam])
    fasta = FastaFile(chr11_fa)
    bam = BamReader(hifi_bam)
    wins = plan_windows(opt, bam.references, bam.lengths)
    win = [w for w in wins if w.tname == "chr11" and w.beg == 1000001][0]
    chunk = load_chunk(opt, fasta, [bam], win, None, None)
    collect_digars(opt, chunk)
    sites = collect_all_cand_var_sites(opt, chunk.digars, chunk.order,
                                       chunk.reg_beg, chunk.reg_end)
    native = collect_cand_vars_native(opt, sites, chunk.digars, chunk.order)
    if native is None:
        import pytest
        pytest.skip("native profilejoin unavailable")
    slow = collect_cand_vars(opt, sites, chunk.digars, chunk.order)
    assert (slow.total_cov == native.total_cov).all()
    assert (slow.low_qual_cov == native.low_qual_cov).all()
    assert (slow.alle_covs == native.alle_covs).all()
    assert (slow.strand_covs == native.strand_covs).all()


def test_distinct_late_byte_alts_stay_distinct():
    """Regression: two same-pos same-length INS alleles differing only in
    the 8th base must stay two candidate sites.  A mixed int64/uint64
    np.stack promoted the packed key columns to float64, rounding the alt
    hashes (> 2^53) together and collapsing the sites to one."""
    import numpy as np
    from longcalld_tpu.core.digar import ReadDigar
    from longcalld_tpu.core.sites import cand_packed_keys, make_cand_vars
    from longcalld_tpu.io.bam import CEQUAL, CINS
    from longcalld_tpu.utils.intervals import IntervalSet

    def mk(alt):
        alt = np.asarray(alt, dtype=np.uint8)
        seq = np.concatenate([np.zeros(10, np.uint8), alt,
                              np.ones(10, np.uint8)])
        return ReadDigar(
            beg=101, end=120, is_rev=False,
            pos=np.array([101, 111, 111], np.int64),
            type=np.array([CEQUAL, CINS, CEQUAL], np.uint8),
            len=np.array([10, len(alt), 10], np.int32),
            qi=np.array([0, 10, 10 + len(alt)], np.int32),
            low_qual=np.zeros(3, bool), seq=seq,
            qual=np.full(len(seq), 40, np.uint8),
            noisy_regs=IntervalSet(), qlen=len(seq))

    d1 = mk([3] * 7 + [2])
    d2 = mk([3] * 8)
    opt = CallOpts.hifi(ref_fa_fn="x", in_bam_fns=["y"])
    sites = collect_all_cand_var_sites(opt, [d1, d2], [0, 1], 1, 10**9)
    assert len(sites) == 2, sites
    kb = cand_packed_keys(make_cand_vars(sites))
    assert kb[0] != kb[1]
