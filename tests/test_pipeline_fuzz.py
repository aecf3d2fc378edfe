"""Randomized end-to-end fuzz: planted diploid variants -> simulated
HiFi-like reads -> full pipeline.  Asserts

1. the device kernel path and the pure host-oracle path emit IDENTICAL
   VCF bodies (the production invariant behind every use_device routing);
2. every planted clean het/hom SNV is recovered with the right genotype
   class;
3. planted small indels are recovered at (or, in repeat context, shifted
   near) the planted site.

Complements the fixed-scenario e2e tests with seed-randomized placement,
genotypes, and read sampling (SURVEY section 4 strategy).
"""

import io

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call
from longcalld_tpu.io.bam import CINS
from longcalld_tpu.io.fasta import FastaFile

from util_bam import make_record, sim_read, write_bam

REF_BEG = 1_350_000
REF_LEN = 9_000
READ_LEN = 5_200
N_READS = 22
ERR = 0.002                      # HiFi-ish substitution error


def _plant_variants(rng, ref4):
    """Random well-separated variants: (pos, kind, payload, genotype)
    with genotype in {'het1', 'het2', 'hom'}."""
    out = []
    pos = REF_BEG + 600
    while pos < REF_BEG + REF_LEN - 800:
        kind = rng.choice(["snv", "snv", "snv", "ins", "del"])
        gt = rng.choice(["het1", "het2", "hom"])
        if kind == "snv":
            payload = (int(ref4[pos]) + 1 + int(rng.integers(3))) % 4
        elif kind == "ins":
            payload = rng.integers(0, 4, int(rng.integers(2, 9))).tolist()
        else:
            payload = int(rng.integers(2, 9))      # deletion length
        out.append((pos, kind, payload, gt))
        pos += int(rng.integers(400, 900))
    return out


def _sim_read(rng, ref4, start, length, hap, variants):
    bypos = {p: (k, pl, gt) for p, k, pl, gt in variants}
    return sim_read(rng, ref4, start, length, hap, bypos, err=ERR)


def _body(vcf: str):
    return [l for l in vcf.splitlines()
            if l and not l.startswith("#")]


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_pipeline_fuzz_device_host_and_truth(seed, chr11_fa, tmp_path):
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    rng = np.random.default_rng(seed)
    variants = _plant_variants(rng, ref4)

    recs = []
    starts_by_hap = {1: [], 2: []}
    for k in range(N_READS):
        hap = 1 + (k % 2)
        start = REF_BEG + int(rng.integers(0, REF_LEN - READ_LEN))
        starts_by_hap[hap].append(start)
        seq4, cigar = _sim_read(rng, ref4, start, READ_LEN, hap, variants)
        flag = 16 if k % 4 >= 2 else 0
        quals = np.full(len(seq4), 35, dtype=np.uint8)
        recs.append((start, make_record(0, start, f"fz{seed}_{k:03d}", cigar,
                                        seq4, quals, mapq=60, flag=flag)))
    recs.sort(key=lambda r: r[0])
    bam = str(tmp_path / "fuzz.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], [r[1] for r in recs])

    region = f"chr11:{REF_BEG + 1}-{REF_BEG + REF_LEN}"

    def call(use_device):
        out = io.StringIO()
        opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[bam],
                            use_device=use_device, regions=[region])
        run_call(opt, out, "fuzz")
        return out.getvalue()

    dev = _body(call(True))
    host = _body(call(False))
    assert dev == host, "device path VCF differs from host oracle"

    # truth recovery: every planted SNV with enough covering reads
    called = {}
    for line in dev:
        f = line.split("\t")
        called[int(f[1])] = (f[3], f[4], f[9].split(":")[0])
    n_reads_at = lambda p: sum(1 for s, _ in recs
                               if s <= p < s + READ_LEN - 60)

    def hap_cov_at(p, gt):
        """TRUE per-haplotype alt coverage at p: the caller's AF >= 0.2
        and alt >= 2 gates see the actual hap split, not an even one."""
        per = {h: sum(1 for s in starts_by_hap[h]
                      if s <= p < s + READ_LEN - 60) for h in (1, 2)}
        if gt == "hom":
            return per[1] + per[2]
        return per[1] if gt == "het1" else per[2]

    for pos, kind, payload, gt in variants:
        cov = n_reads_at(pos)
        hap_cov = hap_cov_at(pos, gt)
        # comfortably above the caller's gates (DP>=5, alt>=2, AF>=0.2)
        if kind != "snv" or cov < 5 or hap_cov < 4 or hap_cov < 0.25 * cov:
            continue
        vpos = pos + 1                     # VCF is 1-based
        assert vpos in called, f"seed {seed}: planted SNV at {vpos} missed"
        ref_b, alt_b, gt_s = called[vpos]
        assert alt_b == "ACGT"[payload]
        alleles = gt_s.replace("|", "/").split("/")
        if gt == "hom":
            assert alleles == ["1", "1"], (vpos, gt_s)
        else:
            assert sorted(alleles) == ["0", "1"], (vpos, gt_s)

    # planted indels: recovered at or near (±30 bp, repeat-normalized) the
    # planted anchor.
    #
    # Known (reference-faithful) miss mode, found by soak seed 206: an
    # indel inside a low-complexity noisy region whose covering reads are
    # mostly UNPHASED gets re-called from the elected phase set's few
    # phased reads only, so its DP can drop below min_dp and the record is
    # dropped at write time — exactly the reference's behavior
    # (update_cand_var_profile_from_cons_aln_str2 profiles MSA reads only;
    # write_var_to_vcf re-filters on min_dp, vcf_utils.c:108-114).  The
    # checked-in seeds avoid that context.
    for pos, kind, payload, gt in variants:
        if kind == "snv":
            continue
        cov = n_reads_at(pos)
        hap_cov = hap_cov_at(pos, gt)
        if cov < 5 or hap_cov < 4 or hap_cov < 0.25 * cov:
            continue
        near = [p for p in called
                if abs(p - (pos + 1)) <= 30
                and len(called[p][0]) != len(called[p][1])]
        assert near, f"seed {seed}: planted {kind} at {pos + 1} missed"


def test_germline_sv_ins_and_del(chr11_fa, tmp_path):
    """Germline het 45bp INS and 60bp DEL ride the noisy-region
    re-assembly path (star-MSA consensus -> ref<->cons variant
    extraction) and must emit phased SVTYPE/SVLEN records."""
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    rng = np.random.default_rng(31)
    ins_pos = REF_BEG + 2_800
    del_pos = REF_BEG + 6_300
    ins_seq = rng.integers(0, 4, 45).tolist()
    variants = {ins_pos: ("ins", ins_seq, "het1"),
                del_pos: ("del", 60, "het2")}
    # phasing scaffold
    p = REF_BEG + 500
    k = 0
    while p < REF_BEG + REF_LEN - 600:
        if min(abs(p - ins_pos), abs(p - del_pos)) > 150:
            alt = (int(ref4[p]) + 1 + int(rng.integers(3))) % 4
            variants[p] = ("snv", alt, "het1" if k % 2 == 0 else "het2")
            k += 1
        p += int(rng.integers(350, 700))

    recs = []
    for k in range(N_READS):
        hap = 1 + (k % 2)
        start = REF_BEG + int(rng.integers(0, REF_LEN - READ_LEN))
        seq4, cigar = sim_read(rng, ref4, start, READ_LEN, hap, variants,
                               err=0.002)
        flag = 16 if k % 4 >= 2 else 0
        quals = np.full(len(seq4), 35, dtype=np.uint8)
        recs.append((start, make_record(0, start, f"sv{k:03d}", cigar,
                                        seq4, quals, mapq=60, flag=flag)))
    recs.sort(key=lambda r: r[0])
    bam = str(tmp_path / "gsv.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], [r[1] for r in recs])
    region = f"chr11:{REF_BEG + 1}-{REF_BEG + REF_LEN}"

    def call(use_device):
        out = io.StringIO()
        opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[bam],
                            use_device=use_device, regions=[region])
        run_call(opt, out, "gsv")
        return out.getvalue()

    dev = _body(call(True))
    assert dev == _body(call(False))

    svs = {}
    for l in dev:
        f = l.split("\t")
        dlen = len(f[4]) - len(f[3])
        if abs(dlen) >= 30:
            svs[int(f[1])] = (dlen, f[7], f[9].split(":")[0])
    ins_hit = [p for p in svs if abs(p - (ins_pos + 1)) <= 50
               and svs[p][0] >= 40]
    del_hit = [p for p in svs if abs(p - (del_pos + 1)) <= 50
               and svs[p][0] <= -55]
    assert ins_hit, "planted 45bp het INS missed"
    assert del_hit, "planted 60bp het DEL missed"
    pi, pd = ins_hit[0], del_hit[0]
    assert "SVTYPE=INS" in svs[pi][1] and f"SVLEN={svs[pi][0]}" in svs[pi][1]
    assert "SVTYPE=DEL" in svs[pd][1] and f"SVLEN={svs[pd][0]}" in svs[pd][1]
    for p in (pi, pd):
        gt = svs[p][2].replace("|", "/").split("/")
        assert sorted(gt) == ["0", "1"], (p, svs[p])


@pytest.mark.parametrize("seed", [61, 73])
def test_ont_mode_fuzz(seed, chr11_fa, tmp_path):
    """ONT preset on noisy (3% substitution error) simulated reads:
    device==host equality through the ONT-only gates (Fisher strand bias,
    25bp noisy window, homopolymer-indel consensus rule) plus recovery of
    well-covered planted SNVs."""
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    rng = np.random.default_rng(seed)
    variants = {}
    pos = REF_BEG + 600
    k = 0
    while pos < REF_BEG + REF_LEN - 800:
        alt = (int(ref4[pos]) + 1 + int(rng.integers(3))) % 4
        variants[pos] = ("snv", alt,
                         ["het1", "het2", "hom"][int(rng.integers(3))])
        pos += int(rng.integers(400, 900))
        k += 1

    recs = []
    starts_by_hap = {1: [], 2: []}
    for k in range(30):
        hap = 1 + (k % 2)
        start = REF_BEG + int(rng.integers(0, REF_LEN - READ_LEN))
        starts_by_hap[hap].append(start)
        seq4, cigar = sim_read(rng, ref4, start, READ_LEN, hap, variants,
                               err=0.03)
        quals = np.full(len(seq4), 20, dtype=np.uint8)
        recs.append((start, make_record(0, start, f"o{seed}_{k:03d}", cigar,
                                        seq4, quals, mapq=60,
                                        flag=16 if k % 4 >= 2 else 0)))
    recs.sort(key=lambda r: r[0])
    bam = str(tmp_path / "ontfz.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], [r[1] for r in recs])
    region = f"chr11:{REF_BEG + 1}-{REF_BEG + REF_LEN}"

    def call(use_device):
        out = io.StringIO()
        opt = CallOpts.ont(ref_fa_fn=chr11_fa, in_bam_fns=[bam],
                           use_device=use_device, regions=[region])
        run_call(opt, out, "ont-fuzz")
        return _body(out.getvalue())

    dev = call(True)
    assert dev == call(False), "ONT device path differs from host oracle"

    called = {int(l.split("\t")[1]): l.split("\t")[4] for l in dev}
    n_hit = n_eligible = 0
    for pos, (kind, payload, gt) in variants.items():
        per = {h: sum(1 for s in starts_by_hap[h]
                      if s <= pos < s + READ_LEN - 60) for h in (1, 2)}
        cov = per[1] + per[2]
        hap_cov = cov if gt == "hom" else per[1 if gt == "het1" else 2]
        if cov < 8 or hap_cov < 6 or hap_cov < 0.3 * cov:
            continue
        n_eligible += 1
        if called.get(pos + 1) == "ACGT"[payload]:
            n_hit += 1
    # 3% error ONT reads: demand recall on well-covered sites, allowing
    # an occasional strand-bias/noisy-window casualty
    assert n_eligible >= 5
    assert n_hit >= n_eligible - 1, (n_hit, n_eligible)
