"""Somatic-mode truth fuzz: a planted mosaic SNV (sub-0.2 AF, one
haplotype, clean context) must surface as a SOMATIC record, germline
records must be unchanged vs a plain run, and the device path must match
the host oracle byte for byte.  Drives the full stack: low-AF candidate
promotion, phase-set/hap election, per-alt-read feature vector, SNV gate
(somatic_call.py, assign_hap.c:549-1668 analog)."""

import io

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call
from longcalld_tpu.io.fasta import FastaFile

from util_bam import make_record, sim_read, write_bam

REF_BEG = 1_360_000
REF_LEN = 9_000
READ_LEN = 6_000
N_READS = 30
SOM_POS = REF_BEG + 4_517        # mosaic SNV site (clean, non-repeat)


def _body(vcf):
    return [l for l in vcf.splitlines() if l and not l.startswith("#")]


@pytest.mark.parametrize("seed", [3])
def test_planted_mosaic_snv_called_somatic(seed, chr11_fa, tmp_path):
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    rng = np.random.default_rng(seed)

    # germline het scaffold for phasing (alternating haps)
    germline = {}
    pos = REF_BEG + 500
    k = 0
    while pos < REF_BEG + REF_LEN - 600:
        if abs(pos - SOM_POS) > 60:
            alt = (int(ref4[pos]) + 1 + int(rng.integers(3))) % 4
            germline[pos] = ("snv", alt, "het1" if k % 2 == 0 else "het2")
            k += 1
        pos += int(rng.integers(300, 600))

    som_alt = (int(ref4[SOM_POS]) + 1) % 4
    # mosaic: 4 of the 15 hap-1 reads carry the somatic allele
    som_carriers = {0, 4, 8, 12}          # read indices (hap 1 = even k)

    recs = []
    for k in range(N_READS):
        hap = 1 + (k % 2)
        start = REF_BEG + int(rng.integers(0, REF_LEN - READ_LEN))
        variants = dict(germline)
        if k in som_carriers:
            variants[SOM_POS] = ("snv", som_alt, "hom")   # always on
        seq4, cigar = sim_read(rng, ref4, start, READ_LEN, hap, variants,
                               err=0.0015)
        flag = 16 if k % 4 >= 2 else 0
        quals = np.full(len(seq4), 35, dtype=np.uint8)
        recs.append((start, make_record(0, start, f"sm{seed}_{k:03d}", cigar,
                                        seq4, quals, mapq=60, flag=flag)))
    recs.sort(key=lambda r: r[0])
    bam = str(tmp_path / "som.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], [r[1] for r in recs])
    region = f"chr11:{REF_BEG + 1}-{REF_BEG + REF_LEN}"

    def call(use_device, somatic):
        out = io.StringIO()
        opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[bam],
                            use_device=use_device, regions=[region],
                            out_somatic=somatic)
        run_call(opt, out, "som-fuzz")
        return out.getvalue()

    som_dev = _body(call(True, True))
    assert som_dev == _body(call(False, True)), "device != host in -s mode"

    som_lines = [l for l in som_dev if "SOMATIC" in l.split("\t")[7]]
    som_pos = {int(l.split("\t")[1]) for l in som_lines}
    assert SOM_POS + 1 in som_pos, "planted mosaic SNV not called somatic"
    for l in som_lines:
        f = l.split("\t")
        if int(f[1]) == SOM_POS + 1:
            assert f[4] == "ACGT"[som_alt]

    # germline records stay identical to the plain (non -s) run
    plain = _body(call(True, False))
    germ_like = [l for l in som_dev if "SOMATIC" not in l.split("\t")[7]]
    assert germ_like == plain


def test_planted_somatic_ins_sv(chr11_fa, tmp_path):
    """A >=30 bp insertion private to a few hap-2 reads drives the
    noisy-region somatic SV mining path (consensus.py somatic mining,
    collect_var.c:2446-2586 analog) and must come out SOMATIC with
    SVTYPE=INS."""
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    rng = np.random.default_rng(9)

    germline = {}
    pos = REF_BEG + 500
    k = 0
    while pos < REF_BEG + REF_LEN - 600:
        if abs(pos - SOM_POS) > 120:
            alt = (int(ref4[pos]) + 1 + int(rng.integers(3))) % 4
            germline[pos] = ("snv", alt, "het1" if k % 2 == 0 else "het2")
            k += 1
        pos += int(rng.integers(300, 600))

    ins_seq = rng.integers(0, 4, 45).tolist()
    carriers = {1, 5, 9}                 # hap-2 reads (odd k)

    recs = []
    for k in range(N_READS):
        hap = 1 + (k % 2)
        start = REF_BEG + int(rng.integers(0, REF_LEN - READ_LEN))
        variants = dict(germline)
        if k in carriers:
            variants[SOM_POS] = ("ins", ins_seq, "hom")
        seq4, cigar = sim_read(rng, ref4, start, READ_LEN, hap, variants,
                               err=0.0015)
        flag = 16 if k % 4 >= 2 else 0
        quals = np.full(len(seq4), 35, dtype=np.uint8)
        recs.append((start, make_record(0, start, f"sv{k:03d}", cigar,
                                        seq4, quals, mapq=60, flag=flag)))
    recs.sort(key=lambda r: r[0])
    bam = str(tmp_path / "somsv.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], [r[1] for r in recs])
    region = f"chr11:{REF_BEG + 1}-{REF_BEG + REF_LEN}"

    out = io.StringIO()
    opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[bam],
                        use_device=False, regions=[region],
                        out_somatic=True)
    run_call(opt, out, "som-sv-fuzz")
    body = _body(out.getvalue())
    som = [l for l in body if "SOMATIC" in l.split("\t")[7]]
    hits = [l for l in som
            if abs(int(l.split("\t")[1]) - (SOM_POS + 1)) <= 50
            and len(l.split("\t")[4]) - len(l.split("\t")[3]) >= 30]
    assert hits, "planted somatic INS SV not called"
    assert "SVTYPE=INS" in hits[0].split("\t")[7]


def test_somatic_density_kill(chr11_fa, tmp_path):
    """>somatic_win_max_vars mosaic SNVs within somatic_win bp taint the
    region and suppress the calls (mark_somatic_vars density rule,
    assign_hap.c:1541-1565): the same planted pattern that yields a
    SOMATIC record in isolation must yield none when 8 sites cluster in
    800 bp."""
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    rng = np.random.default_rng(17)

    germline = {}
    pos = REF_BEG + 500
    k = 0
    cluster = [REF_BEG + 4_000 + 100 * j for j in range(8)]
    while pos < REF_BEG + REF_LEN - 600:
        if all(abs(pos - cp) > 60 for cp in cluster):
            alt = (int(ref4[pos]) + 1 + int(rng.integers(3))) % 4
            germline[pos] = ("snv", alt, "het1" if k % 2 == 0 else "het2")
            k += 1
        pos += int(rng.integers(300, 600))

    carriers = {0, 4, 8, 12}
    recs = []
    for k in range(N_READS):
        hap = 1 + (k % 2)
        start = REF_BEG + int(rng.integers(0, REF_LEN - READ_LEN))
        variants = dict(germline)
        if k in carriers:
            for cp in cluster:
                variants[cp] = ("snv", (int(ref4[cp]) + 1) % 4, "hom")
        seq4, cigar = sim_read(rng, ref4, start, READ_LEN, hap, variants,
                               err=0.0015)
        quals = np.full(len(seq4), 35, dtype=np.uint8)
        recs.append((start, make_record(0, start, f"dk{k:03d}", cigar,
                                        seq4, quals, mapq=60,
                                        flag=16 if k % 4 >= 2 else 0)))
    recs.sort(key=lambda r: r[0])
    bam = str(tmp_path / "dense.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], [r[1] for r in recs])

    out = io.StringIO()
    opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[bam],
                        use_device=False,
                        regions=[f"chr11:{REF_BEG + 1}-{REF_BEG + REF_LEN}"],
                        out_somatic=True)
    run_call(opt, out, "density")
    som = [l for l in _body(out.getvalue())
           if "SOMATIC" in l.split("\t")[7]]
    in_cluster = [l for l in som
                  if any(abs(int(l.split("\t")[1]) - (cp + 1)) <= 5
                         for cp in cluster)]
    assert not in_cluster, f"density rule failed: {in_cluster[:2]}"


def test_somatic_altreads_name_exact_carriers(chr11_fa, tmp_path):
    """--out-som-var-rnames: the SOMATIC record's ALTREADS must name
    exactly the reads that carry the planted mosaic allele (the read-id
    list threaded from the profile, collect_var.c:1562-1584)."""
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    rng = np.random.default_rng(3)
    germline = {}
    pos = REF_BEG + 500
    k = 0
    while pos < REF_BEG + REF_LEN - 600:
        if abs(pos - SOM_POS) > 60:
            alt = (int(ref4[pos]) + 1 + int(rng.integers(3))) % 4
            germline[pos] = ("snv", alt, "het1" if k % 2 == 0 else "het2")
            k += 1
        pos += int(rng.integers(300, 600))
    som_alt = (int(ref4[SOM_POS]) + 1) % 4
    som_carriers = {0, 4, 8, 12}
    recs = []
    carrier_names = set()
    for k in range(N_READS):
        hap = 1 + (k % 2)
        start = REF_BEG + int(rng.integers(0, REF_LEN - READ_LEN))
        variants = dict(germline)
        name = f"ar{k:03d}"
        if k in som_carriers:
            variants[SOM_POS] = ("snv", som_alt, "hom")
            if start <= SOM_POS < start + READ_LEN:
                carrier_names.add(name)
        seq4, cigar = sim_read(rng, ref4, start, READ_LEN, hap, variants,
                               err=0.0015)
        quals = np.full(len(seq4), 35, dtype=np.uint8)
        recs.append((start, make_record(0, start, name, cigar, seq4, quals,
                                        mapq=60, flag=16 if k % 4 >= 2
                                        else 0)))
    recs.sort(key=lambda r: r[0])
    bam = str(tmp_path / "ar.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], [r[1] for r in recs])

    out = io.StringIO()
    opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[bam],
                        use_device=False, out_somatic=True,
                        output_somatic_var_rnames=True,
                        regions=[f"chr11:{REF_BEG + 1}-{REF_BEG + REF_LEN}"])
    run_call(opt, out, "altreads")
    target = [l for l in _body(out.getvalue())
              if int(l.split("\t")[1]) == SOM_POS + 1]
    assert target and "SOMATIC" in target[0].split("\t")[7]
    f = target[0].split("\t")
    fmt = dict(zip(f[8].split(":"), f[9].split(":")))
    assert "ALTREADS" in fmt
    named = set(fmt["ALTREADS"].split(","))
    assert named == carrier_names, (named, carrier_names)
    # germline (non-SOMATIC) records must NOT carry ALTREADS
    germ = [l for l in _body(out.getvalue())
            if "SOMATIC" not in l.split("\t")[7]]
    assert all("ALTREADS" not in l.split("\t")[8] for l in germ)


def test_planted_somatic_del_sv(chr11_fa, tmp_path):
    """A 50bp deletion private to 3 hap-1 reads must come out of the
    somatic SV mining path as SOMATIC SVTYPE=DEL."""
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    rng = np.random.default_rng(21)
    germline = {}
    pos = REF_BEG + 500
    k = 0
    while pos < REF_BEG + REF_LEN - 600:
        if abs(pos - SOM_POS) > 150:
            alt = (int(ref4[pos]) + 1 + int(rng.integers(3))) % 4
            germline[pos] = ("snv", alt, "het1" if k % 2 == 0 else "het2")
            k += 1
        pos += int(rng.integers(300, 600))
    carriers = {0, 4, 8}                   # hap-1 reads (even k)
    recs = []
    for k in range(N_READS):
        hap = 1 + (k % 2)
        start = REF_BEG + int(rng.integers(0, REF_LEN - READ_LEN))
        variants = dict(germline)
        if k in carriers:
            variants[SOM_POS] = ("del", 50, "hom")
        seq4, cigar = sim_read(rng, ref4, start, READ_LEN, hap, variants,
                               err=0.0015)
        quals = np.full(len(seq4), 35, dtype=np.uint8)
        recs.append((start, make_record(0, start, f"sd{k:03d}", cigar,
                                        seq4, quals, mapq=60,
                                        flag=16 if k % 4 >= 2 else 0)))
    recs.sort(key=lambda r: r[0])
    bam = str(tmp_path / "somdel.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], [r[1] for r in recs])

    out = io.StringIO()
    opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[bam],
                        use_device=False, out_somatic=True,
                        regions=[f"chr11:{REF_BEG + 1}-{REF_BEG + REF_LEN}"])
    run_call(opt, out, "som-del-fuzz")
    som = [l for l in _body(out.getvalue())
           if "SOMATIC" in l.split("\t")[7]]
    hits = [l for l in som
            if abs(int(l.split("\t")[1]) - (SOM_POS + 1)) <= 55
            and len(l.split("\t")[3]) - len(l.split("\t")[4]) >= 40]
    assert hits, "planted somatic DEL SV not called"
    assert "SVTYPE=DEL" in hits[0].split("\t")[7]
