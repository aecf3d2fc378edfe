"""Adversarial/edge inputs must produce clean empty output, not crashes:
read-free regions, unmapped-only records, clip-dominated reads, reads with
zero events, single-read windows, and a window at the contig edge."""

import io

import numpy as np

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call
from longcalld_tpu.io.bam import CDIFF, CEQUAL
from longcalld_tpu.io.fasta import FastaFile

from util_bam import make_record, write_bam


def _call(chr11_fa, bam, region):
    out = io.StringIO()
    opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[bam],
                        use_device=False, regions=[region])
    n = run_call(opt, out, "edge")
    return n, [l for l in out.getvalue().splitlines()
               if not l.startswith("#")]


def test_region_with_no_reads(chr11_fa, hifi_bam):
    n, body = _call(chr11_fa, hifi_bam, "chr11:1-1000")
    assert n == 0 and body == []


def test_unmapped_and_low_mapq_only(chr11_fa, tmp_path):
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    seq = ref4[1_300_000:1_300_500].copy()
    quals = np.full(len(seq), 30, dtype=np.uint8)
    recs = [
        make_record(0, 1_300_000, "unmapped", [], seq, quals, mapq=0,
                    flag=4),
        make_record(0, 1_300_000, "lowmq", [(7, len(seq))], seq, quals,
                    mapq=5, flag=0),
        make_record(0, 1_300_000, "secondary", [(7, len(seq))], seq, quals,
                    mapq=60, flag=256),
    ]
    bam = str(tmp_path / "junk.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], recs)
    n, body = _call(chr11_fa, bam, "chr11:1300000-1301000")
    assert n == 0 and body == []


def test_clip_dominated_and_eventless_reads(chr11_fa, tmp_path):
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    start = 1_310_000
    aln = ref4[start:start + 300].copy()
    clip = np.zeros(400, dtype=np.uint8)
    recs = []
    for k in range(6):
        # 400bp softclip + 300bp perfect match + 400bp softclip
        seq = np.concatenate([clip, aln, clip])
        quals = np.full(len(seq), 30, dtype=np.uint8)
        recs.append(make_record(0, start, f"clip{k}",
                                [(4, 400), (7, 300), (4, 400)], seq, quals,
                                mapq=60, flag=0))
        # eventless exact read
        quals2 = np.full(300, 30, dtype=np.uint8)
        recs.append(make_record(0, start, f"exact{k}", [(7, 300)],
                                aln, quals2, mapq=60, flag=16))
    bam = str(tmp_path / "clips.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], recs)
    n, body = _call(chr11_fa, bam, "chr11:1310000-1310400")
    # perfect reads: no variants, but must not crash; long clips flag
    # noisy regions that have nothing to assemble
    assert body == [l for l in body if "\t" in l]


def test_single_read_window(chr11_fa, tmp_path):
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    start = 1_320_000
    seq = ref4[start:start + 500].copy()
    seq[100] = (seq[100] + 1) % 4
    quals = np.full(len(seq), 30, dtype=np.uint8)
    recs = [make_record(0, start, "solo",
                        [(7, 100), (8, 1), (7, 399)], seq, quals,
                        mapq=60, flag=0)]
    bam = str(tmp_path / "solo.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], recs)
    n, body = _call(chr11_fa, bam, "chr11:1320000-1320500")
    assert n == 0      # DP 1 < min_dp: no call, no crash


def test_window_at_contig_edge(chr11_fa, tmp_path):
    fa = FastaFile(chr11_fa)
    L = fa.seq_len("chr11")
    ref4 = fa.fetch_nt4("chr11", 0, L - 1)
    start = max(0, L - 400)
    seq = ref4[start:L].copy()
    quals = np.full(len(seq), 30, dtype=np.uint8)
    recs = [make_record(0, start, f"edge{k}", [(7, len(seq))], seq, quals,
                        mapq=60, flag=0) for k in range(6)]
    bam = str(tmp_path / "edge.bam")
    write_bam(bam, ["chr11"], [L], recs)
    n, body = _call(chr11_fa, bam, f"chr11:{start + 1}-{L}")
    assert n == 0 and body == []
