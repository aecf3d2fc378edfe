"""Process-parallel window ranges (the kt_for analog past the GIL).

run_call hands many-window streams to subprocess workers
(core/procpool.py); workers genotype without stitching and the main
process runs EVERY stitch vote serially on the returned records
(pipeline._cross_flip_decision / _apply_cross_flip — the record-level
form of flip_variant_hap, /root/reference/src/collect_var.c:1640-1695).
These tests pin byte-equality of that path against the sequential one,
on real HG002 data and on planted-variant fuzz where every window
boundary is also a worker-range boundary.
"""

import dataclasses
import io

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call
from longcalld_tpu.io.fasta import FastaFile

from util_bam import make_record, sim_read, write_bam


def _body(vcf: str):
    return [l for l in vcf.splitlines() if not l.startswith("##")]


def _call(opt) -> str:
    out = io.StringIO()
    run_call(opt, out, "procs-test")
    return out.getvalue()


def test_procs_match_sequential_real_data(chr11_fa, hifi_bam):
    """50 kb windows over the full HG002 chr11 slice: the process pool must
    reproduce the sequential VCF byte-for-byte (headers aside)."""
    base = dict(ref_fa_fn=chr11_fa, in_bam_fns=[hifi_bam],
                window_size=50_000, use_device=False)
    seq = _call(CallOpts.hifi(n_threads=1, host_procs=0, **base))
    par = _call(CallOpts.hifi(n_threads=4, host_procs=4, **base))
    assert _body(seq) == _body(par)
    assert len(_body(seq)) > 100


def test_procs_used_only_for_many_windows(chr11_fa, hifi_bam, monkeypatch):
    """Auto mode must leave few-window runs on the in-process path (where
    the device does the heavy alignment) and engage the pool only when the
    stream has enough windows to matter."""
    from longcalld_tpu.core import pipeline as pl

    calls = []
    real = pl._run_call_procs

    def spy(opt, out, wins, n_workers, bams=None):
        calls.append(len(wins))
        return real(opt, out, wins, n_workers, bams)

    monkeypatch.setattr(pl, "_run_call_procs", spy)
    base = dict(ref_fa_fn=chr11_fa, in_bam_fns=[hifi_bam],
                use_device=False, n_threads=4)
    _call(CallOpts.hifi(window_size=500_000, **base))   # 4 windows
    assert calls == []
    _call(CallOpts.hifi(window_size=50_000, **base))    # ~22 busy windows
    assert len(calls) == 1


@pytest.mark.parametrize("seed", [3, 11, 27])
def test_procs_cross_range_stitch_fuzz(seed, chr11_fa, tmp_path):
    """Planted diploid hets over 5 kb windows with reads crossing every
    boundary, forced single-window ranges (host_procs=8 over ~8 windows):
    every stitch vote crosses a worker-range boundary and must reproduce
    the sequential flip/rename chain exactly."""
    REF_BEG, REF_LEN, READ_LEN, N_READS = 1_320_000, 40_000, 7_000, 60
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    rng = np.random.default_rng(seed)
    variants = {}
    pos = REF_BEG + 400
    while pos < REF_BEG + REF_LEN - 600:
        gt = ["het1", "het2"][int(rng.integers(2))]
        alt = (int(ref4[pos]) + 1 + int(rng.integers(3))) % 4
        variants[pos] = ("snv", alt, gt)
        pos += int(rng.integers(300, 900))

    recs = []
    for k in range(N_READS):
        hap = 1 + (k % 2)
        start = REF_BEG + int(rng.integers(0, REF_LEN - READ_LEN))
        seq4, cigar = sim_read(rng, ref4, start, READ_LEN, hap, variants,
                               err=0.002)
        quals = np.full(len(seq4), 35, dtype=np.uint8)
        recs.append((start, make_record(0, start, f"pr{seed}_{k:03d}", cigar,
                                        seq4, quals, mapq=60,
                                        flag=16 if k % 4 >= 2 else 0)))
    recs.sort(key=lambda r: r[0])
    bam = str(tmp_path / "procs.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], [r[1] for r in recs])

    base = dict(ref_fa_fn=chr11_fa, in_bam_fns=[bam], use_device=False,
                regions=[f"chr11:{REF_BEG + 1}-{REF_BEG + REF_LEN}"],
                window_size=5_000)
    seq = _call(CallOpts.hifi(n_threads=1, host_procs=0, **base))
    par = _call(CallOpts.hifi(n_threads=8, host_procs=8, **base))
    assert _body(seq) == _body(par)
    # sanity: the run actually phased across boundaries (PS blocks span
    # multiple windows), otherwise this fuzz exercises nothing
    ps_vals = [l.split("\t")[9].split(":")[-1] for l in _body(seq)
               if "PS" in l.split("\t")[8]]
    assert ps_vals and len(set(ps_vals)) < len(ps_vals)


def test_procpool_error_propagates_and_pool_survives(chr11_fa, hifi_bam):
    """A worker-side failure must surface as a RuntimeError with the worker
    traceback, and the persistent pool must stay usable afterwards."""
    from longcalld_tpu.core import procpool

    base = dict(ref_fa_fn=chr11_fa, in_bam_fns=[hifi_bam],
                window_size=50_000, use_device=False)
    good = CallOpts.hifi(n_threads=2, host_procs=2, **base)
    ok = _call(good)

    bad = dataclasses.replace(
        CallOpts.hifi(n_threads=2, host_procs=2, **base),
        in_bam_fns=["/nonexistent/nope.bam"])
    from longcalld_tpu.core.windows import Window
    wins = [Window(0, "chr11", 1, 50_000, 0, 0)]
    with pytest.raises(RuntimeError, match="range worker failed"):
        list(procpool.imap_ranges(bad, wins, [(0, 1)], n_workers=2))

    again = _call(good)
    assert _body(ok) == _body(again)


@pytest.mark.parametrize("seed", [5])
def test_procs_somatic_cross_range_equality(seed, chr11_fa, tmp_path):
    """Somatic mode (-s) across worker-range boundaries (round-4 review
    weakness 5): a planted mosaic SNV and a carrier-private >=30 bp INS in
    a multi-window scene with boundary-crossing reads must come out
    byte-identical between the sequential path and single-window ranges
    (every stitch vote crosses a range boundary).  The somatic hap
    election runs inside each window's worker; the cross-range flip must
    commute past it exactly as it does for germline records."""
    REF_BEG, REF_LEN, READ_LEN, N_READS = 1_320_000, 30_000, 7_000, 48
    SOM_POS = REF_BEG + 14_800
    INS_AT = REF_BEG + 21_433
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    rng = np.random.default_rng(seed)
    variants = {}
    pos = REF_BEG + 400
    while pos < REF_BEG + REF_LEN - 600:
        if min(abs(pos - SOM_POS), abs(pos - INS_AT)) > 120:
            gt = ["het1", "het2"][int(rng.integers(2))]
            alt = (int(ref4[pos]) + 1 + int(rng.integers(3))) % 4
            variants[pos] = ("snv", alt, gt)
        pos += int(rng.integers(300, 900))
    som_alt = (int(ref4[SOM_POS]) + 1) % 4
    ins_seq = rng.integers(0, 4, 40).tolist()

    recs = []
    for k in range(N_READS):
        hap = 1 + (k % 2)
        start = REF_BEG + int(rng.integers(0, REF_LEN - READ_LEN))
        v = dict(variants)
        if hap == 1 and k % 8 in (0, 2):          # ~1/4 of hap-1 reads
            v[SOM_POS] = ("snv", som_alt, "hom")
        if hap == 2 and k % 8 in (1, 3):
            v[INS_AT] = ("ins", ins_seq, "hom")
        seq4, cigar = sim_read(rng, ref4, start, READ_LEN, hap, v,
                               err=0.0015)
        quals = np.full(len(seq4), 35, dtype=np.uint8)
        recs.append((start, make_record(0, start, f"sp{seed}_{k:03d}",
                                        cigar, seq4, quals, mapq=60,
                                        flag=16 if k % 4 >= 2 else 0)))
    recs.sort(key=lambda r: r[0])
    bam = str(tmp_path / "procs_som.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], [r[1] for r in recs])

    base = dict(ref_fa_fn=chr11_fa, in_bam_fns=[bam], use_device=False,
                out_somatic=True,
                regions=[f"chr11:{REF_BEG + 1}-{REF_BEG + REF_LEN}"],
                window_size=5_000)
    seq = _call(CallOpts.hifi(n_threads=1, host_procs=0, **base))
    par = _call(CallOpts.hifi(n_threads=6, host_procs=6, **base))
    assert _body(seq) == _body(par)
    som_lines = [l for l in _body(seq) if "SOMATIC" in l.split("\t")[7]]
    assert som_lines, "scene produced no somatic records; fuzz is inert"
