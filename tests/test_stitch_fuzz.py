"""Multi-window stitching on simulated reads (the real cross-window path).

Shrinks CallOpts.window_size so a 20 kb simulated diploid slice spans 5
windows with reads crossing every boundary, then asserts

1. device-kernel and host-oracle paths emit identical VCFs through the
   stitch (flip decisions ride read haps, which must agree);
2. every planted het SNV is called phased, and within each phase-set
   block the het1/het2 orientation is CONSISTENT across window
   boundaries (the point of flip_variant_hap, collect_var.c:1640-1695);
3. the multi-window record set equals the single-window run's
   (pos, ref, alt, unordered-GT) set — windowing must not change calls.
"""

import io

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call
from longcalld_tpu.io.fasta import FastaFile

from util_bam import make_record, sim_read, write_bam

REF_BEG = 1_320_000
REF_LEN = 20_000
READ_LEN = 5_000
N_READS = 44
WIN = 4_000


def _plant(rng, ref4):
    out = {}
    pos = REF_BEG + 500
    while pos < REF_BEG + REF_LEN - 600:
        gt = ["het1", "het2"][int(rng.integers(2))]
        alt = (int(ref4[pos]) + 1 + int(rng.integers(3))) % 4
        out[pos] = ("snv", alt, gt)
        pos += int(rng.integers(250, 600))
    return out


def _records(vcf):
    out = {}
    for l in vcf.splitlines():
        if not l or l.startswith("#"):
            continue
        f = l.split("\t")
        fmt = dict(zip(f[8].split(":"), f[9].split(":")))
        out[(int(f[1]), f[3], f[4])] = fmt
    return out


@pytest.mark.parametrize("seed", [5, 19])
def test_stitch_fuzz_multiwindow(seed, chr11_fa, tmp_path):
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    rng = np.random.default_rng(seed)
    variants = _plant(rng, ref4)

    recs = []
    for k in range(N_READS):
        hap = 1 + (k % 2)
        start = REF_BEG + int(rng.integers(0, REF_LEN - READ_LEN))
        seq4, cigar = sim_read(rng, ref4, start, READ_LEN, hap, variants,
                               err=0.002)
        flag = 16 if k % 4 >= 2 else 0
        quals = np.full(len(seq4), 35, dtype=np.uint8)
        recs.append((start, make_record(0, start, f"st{seed}_{k:03d}", cigar,
                                        seq4, quals, mapq=60, flag=flag)))
    recs.sort(key=lambda r: r[0])
    bam = str(tmp_path / "stitch.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], [r[1] for r in recs])
    region = f"chr11:{REF_BEG + 1}-{REF_BEG + REF_LEN}"

    def call(use_device, window_size):
        out = io.StringIO()
        opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[bam],
                            use_device=use_device, regions=[region],
                            window_size=window_size)
        run_call(opt, out, "stitch-fuzz")
        return out.getvalue()

    multi_dev = call(True, WIN)
    multi_host = call(False, WIN)
    assert ([l for l in multi_dev.splitlines() if not l.startswith("##")]
            == [l for l in multi_host.splitlines()
                if not l.startswith("##")])

    multi = _records(multi_dev)
    single = _records(call(True, REF_LEN + 10_000))

    # 3. windowing must not change the calls (phase orientation may flip)
    def norm(rec_map):
        return {k: "".join(sorted(v["GT"].replace("|", "/")))
                for k, v in rec_map.items()}
    assert norm(multi) == norm(single)

    # 2. per-PS orientation consistency for planted hets across boundaries
    by_ps = {}
    for (pos, ref_b, alt_b), fmt in multi.items():
        v = variants.get(pos - 1)
        if v is None or "PS" not in fmt:
            continue
        gt = fmt["GT"]
        assert gt in ("0|1", "1|0"), (pos, gt)
        # orient: True when hap1 carries the alt
        orient = (gt == "1|0") == (v[2] == "het1")
        by_ps.setdefault(fmt["PS"], set()).add(orient)
    assert by_ps, "no planted hets were phased"
    for ps, orients in by_ps.items():
        assert len(orients) == 1, f"phase-set {ps} flips orientation"
    # the stitch must have joined the windows into FEWER blocks than
    # windows (boundary reads carry phase across)
    assert len(by_ps) < REF_LEN // WIN


def test_threaded_runs_deterministic(chr11_fa, hifi_bam):
    """Worker-pool runs must be byte-deterministic: the ordered stitch/emit
    protocol (kt_pipeline analog) serializes output regardless of which
    thread computed each window."""
    import io as _io
    outs = []
    for _ in range(2):
        out = _io.StringIO()
        opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[hifi_bam],
                            n_threads=4, window_size=50_000,
                            use_device=False)
        run_call(opt, out, "det")
        outs.append([l for l in out.getvalue().splitlines()
                     if not l.startswith("##")])
    assert outs[0] == outs[1]
    assert len(outs[0]) > 100


def test_phased_bam_hp_matches_planted_haps(chr11_fa, tmp_path):
    """-b phased BAM: within each PS block, HP tags must separate the
    planted haplotypes perfectly (up to the global flip per block)."""
    from longcalld_tpu.io.bam import BamReader
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    rng = np.random.default_rng(41)
    variants = _plant(rng, ref4)
    recs = []
    truth = {}
    for k in range(N_READS):
        hap = 1 + (k % 2)
        start = REF_BEG + int(rng.integers(0, REF_LEN - READ_LEN))
        name = f"hp{k:03d}"
        truth[name] = hap
        seq4, cigar = sim_read(rng, ref4, start, READ_LEN, hap, variants,
                               err=0.002)
        quals = np.full(len(seq4), 35, dtype=np.uint8)
        recs.append((start, make_record(0, start, name, cigar, seq4, quals,
                                        mapq=60, flag=16 if k % 4 >= 2
                                        else 0)))
    recs.sort(key=lambda r: r[0])
    bam = str(tmp_path / "hp.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], [r[1] for r in recs])
    out_bam = str(tmp_path / "hp_phased.bam")

    out = io.StringIO()
    opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[bam],
                        use_device=False, out_bam_fn=out_bam,
                        regions=[f"chr11:{REF_BEG + 1}-{REF_BEG + REF_LEN}"])
    run_call(opt, out, "hp")

    by_ps = {}
    n_tagged = 0
    rd = BamReader(out_bam)
    for rec in rd:
        hp = rec.get_tag("HP")
        ps = rec.get_tag("PS")
        if hp is None or ps is None:
            continue
        n_tagged += 1
        # orientation within the block: does HP==1 mean planted hap 1?
        by_ps.setdefault(ps, set()).add((int(hp) == truth[rec.qname]))
    assert n_tagged >= N_READS * 0.8, "most reads should be haplotagged"
    for ps, orients in by_ps.items():
        assert len(orients) == 1, f"PS {ps} mixes planted haplotypes"
