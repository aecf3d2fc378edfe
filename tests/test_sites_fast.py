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
