"""Micro-parity, second battery: SV records, write-time refilters, hom
indels — widening the hand-computed parity surface (round-3 review
weakness 5: snapshot parity is self-referential, so every record class
needs at least one case whose EXACT bytes are derived from the
reference's C formulas by hand).

QUAL/GQ hand-math (cal_var_QUAL1 / cal_sample_GQ,
/root/reference/src/collect_var.c:1435-1457, log_p=-3,
log_1p=log10(0.999)):

  depth 5, AD 3,2 (every het below):  QUAL=60(cap), PL=[60,15,90], GQ=45
  depth 5, AD 0,5 (hom):              QUAL=60(cap), PL=[150,15,0], GQ=15

Write-time refilter: records with DP < min_dp (5) or alt AD < min_alt_dp
(2) are dropped AT WRITE TIME (/root/reference/src/vcf_utils.c:108-114),
after calling — asserted by a depth-4 scene that calls nothing.

SV flag: |alt_len - ref_len| >= 30 marks is_sv and emits
SVTYPE/SVLEN INFO (/root/reference/src/collect_var.c:1555,
vcf_utils.c:188-195 analog io/vcf.py:130-136).
"""

import io

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call
from longcalld_tpu.io.bam import CDEL, CDIFF, CEQUAL, CINS
from longcalld_tpu.io.fasta import FastaFile

from util_bam import make_record, write_bam

REF_BEG = 140_000
SPAN = 9_000
_NT = "ACGT"


def _no_hp(ref4, p, w=6):
    s = ref4[p - w:p + w]
    return all(not (s[i] == s[i + 1] == s[i + 2]) for i in range(len(s) - 2))


def _pick(ref4, start, pred):
    p = start
    while not pred(p):
        p += 1
    return p


def _build_read(ref4, hap, snp, sv_anchor, sv_seq, hom_del):
    seq, cig = [], []

    def push(op, ln):
        if ln <= 0:
            return
        if cig and cig[-1][0] == op:
            cig[-1][1] += ln
        else:
            cig.append([op, ln])

    i = REF_BEG
    while i < REF_BEG + SPAN:
        b = int(ref4[i])
        if hap == 1 and i == snp:
            seq.append((b + 1) % 4)
            push(CDIFF, 1)
        elif hap == 1 and i == sv_anchor:
            seq.append(b)
            push(CEQUAL, 1)
            seq.extend(int(x) for x in sv_seq)
            push(CINS, len(sv_seq))
        elif hom_del is not None and i == hom_del:
            push(CDEL, 2)
            i += 2
            continue
        else:
            seq.append(b)
            push(CEQUAL, 1)
        i += 1
    return np.array(seq, dtype=np.uint8), [(o, ln) for o, ln in cig]


def _call_body(chr11_fa, bam):
    opt = CallOpts.hifi(
        ref_fa_fn=chr11_fa, in_bam_fns=[bam], use_device=False,
        regions=[f"chr11:{REF_BEG + 1}-{REF_BEG + SPAN}"])
    buf = io.StringIO()
    run_call(opt, buf, "test")
    return [ln for ln in buf.getvalue().splitlines()
            if not ln.startswith("#")]


def test_sv_ins_record_exact(chr11_fa, tmp_path):
    """40 bp het INS + one het SNP (for the phase set): the SV record's
    bytes — POS/REF/ALT, QUAL 60, GQ 45, VAF 0.400, PS = SNP POS, and
    the SVTYPE=INS;SVLEN=40 INFO — all hand-derived."""
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    snp = _pick(ref4, REF_BEG + 2_000, lambda p: _no_hp(ref4, p))
    sv_a = _pick(ref4, REF_BEG + 5_000, lambda p: _no_hp(ref4, p))
    rng = np.random.default_rng(5)
    sv_seq = rng.integers(0, 4, 40).astype(np.uint8)
    # forbid either-direction left/right shifting of the insertion
    sv_seq[-1] = (ref4[sv_a] + 1) % 4
    sv_seq[0] = (ref4[sv_a + 1] + 1) % 4

    recs = []
    for k in range(5):
        hap = 1 if k < 2 else 2
        seq4, cigar = _build_read(ref4, hap, snp, sv_a, sv_seq, None)
        recs.append(make_record(0, REF_BEG, f"sv{k}_h{hap}", cigar, seq4,
                                np.full(len(seq4), 30, dtype=np.uint8),
                                mapq=60, flag=16 if k in (0, 2) else 0))
    bam = str(tmp_path / "sv.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], recs)
    body = _call_body(chr11_fa, bam)

    first = next(ln for ln in body if int(ln.split("\t")[1]) == snp + 1)
    gt = first.split("\t")[9].split(":")[0]
    assert gt in ("0|1", "1|0")
    ps = snp + 1
    het = f"{gt}:5:3,2:0.400:45:{ps}"

    def nt(p, n=1):
        return "".join(_NT[int(b)] for b in ref4[p:p + n])

    sv_alt = nt(sv_a) + "".join(_NT[int(b)] for b in sv_seq)
    expected = {
        f"chr11\t{snp + 1}\t.\t{nt(snp)}\t{_NT[(ref4[snp] + 1) % 4]}\t60"
        f"\tPASS\tCLEAN;END={snp + 1}\tGT:DP:AD:VAF:GQ:PS\t{het}",
        # the >=30 bp INS goes through noisy-region re-assembly, so the
        # record is NOT flagged CLEAN (clean-path vars only,
        # vcf_utils.c:188)
        f"chr11\t{sv_a + 1}\t.\t{nt(sv_a)}\t{sv_alt}\t60"
        f"\tPASS\tEND={sv_a + 1};SVTYPE=INS;SVLEN=40"
        f"\tGT:DP:AD:VAF:GQ:PS\t{het}",
    }
    assert set(body) == expected


def test_write_time_dp_refilter(chr11_fa, tmp_path):
    """Depth 4 (2 alt + 2 ref): the het SNP is callable by the model but
    the write-time DP < min_dp(5) refilter must drop it — zero records."""
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    snp = _pick(ref4, REF_BEG + 2_000, lambda p: _no_hp(ref4, p))
    recs = []
    for k in range(4):
        hap = 1 if k < 2 else 2
        seq4, cigar = _build_read(ref4, hap, snp, -1, None, None)
        recs.append(make_record(0, REF_BEG, f"dp{k}_h{hap}", cigar, seq4,
                                np.full(len(seq4), 30, dtype=np.uint8),
                                mapq=60, flag=16 if k in (0, 2) else 0))
    bam = str(tmp_path / "dp4.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], recs)
    assert _call_body(chr11_fa, bam) == []


def test_sv_ins_tsd_polya_annotation_exact(chr11_fa, tmp_path):
    """Mobile-element-shaped insertion: the gap's first 8 bp duplicate
    the right flank (one TSD copy) and its tail is 12 A's.  The record
    must carry TSD=<flank seq>;TSDLEN=8;POLYALEN=12;TSDPOS1=<1-based
    right-flank start> — collect_te_info's contract
    (/root/reference/src/align.c:32-83, emitted vcf_utils.c:188-195).
    Body bases are chosen != the corresponding flank base (two
    consecutive mismatches stop the <=1-mismatch TSD scan at exactly 8)
    and contain no A/T (pins POLYALEN at exactly the planted 12)."""
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    snp = _pick(ref4, REF_BEG + 2_000, lambda p: _no_hp(ref4, p))
    sv_a = _pick(ref4, REF_BEG + 5_000, lambda p: _no_hp(ref4, p))
    flank = ref4[sv_a + 1: sv_a + 1 + 50]
    tsd = flank[:8].copy()
    body = np.zeros(30, np.uint8)
    for i in range(30):
        f = int(flank[8 + i]) if 8 + i < len(flank) else 0
        body[i] = 1 if f != 1 else 2
    sv_seq = np.concatenate([tsd, body, np.zeros(12, np.uint8)])  # A tail

    recs = []
    for k in range(5):
        hap = 1 if k < 2 else 2
        seq4, cigar = _build_read(ref4, hap, snp, sv_a, sv_seq, None)
        recs.append(make_record(0, REF_BEG, f"tsd{k}_h{hap}", cigar, seq4,
                                np.full(len(seq4), 30, dtype=np.uint8),
                                mapq=60, flag=16 if k in (0, 2) else 0))
    bam = str(tmp_path / "tsd.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], recs)
    body_v = _call_body(chr11_fa, bam)

    first = next(ln for ln in body_v if int(ln.split("\t")[1]) == snp + 1)
    gt = first.split("\t")[9].split(":")[0]
    het = f"{gt}:5:3,2:0.400:45:{snp + 1}"

    def nt(p, n=1):
        return "".join(_NT[int(b)] for b in ref4[p:p + n])

    tsd_str = "".join(_NT[int(b)] for b in tsd)
    sv_alt = nt(sv_a) + "".join(_NT[int(b)] for b in sv_seq)
    expected = {
        f"chr11\t{snp + 1}\t.\t{nt(snp)}\t{_NT[(ref4[snp] + 1) % 4]}\t60"
        f"\tPASS\tCLEAN;END={snp + 1}\tGT:DP:AD:VAF:GQ:PS\t{het}",
        f"chr11\t{sv_a + 1}\t.\t{nt(sv_a)}\t{sv_alt}\t60"
        f"\tPASS\tEND={sv_a + 1};SVTYPE=INS;SVLEN=50;TSD={tsd_str};"
        f"TSDLEN=8;POLYALEN=12;TSDPOS1={sv_a + 2}"
        f"\tGT:DP:AD:VAF:GQ:PS\t{het}",
    }
    assert set(body_v) == expected


def test_hom_del_record_exact(chr11_fa, tmp_path):
    """2 bp deletion on every read (hom): GT 1/1, QUAL 60 (capped from
    150), GQ 15, no PS (unphased hom), anchor-base REF convention."""
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    dd = _pick(ref4, REF_BEG + 3_000,
               lambda p: _no_hp(ref4, p)
               and ref4[p - 1] != ref4[p + 1] and ref4[p] != ref4[p + 2])
    recs = []
    for k in range(5):
        seq4, cigar = _build_read(ref4, 2, -1, -1, None, dd)
        recs.append(make_record(0, REF_BEG, f"hd{k}", cigar, seq4,
                                np.full(len(seq4), 30, dtype=np.uint8),
                                mapq=60, flag=16 if k % 2 else 0))
    bam = str(tmp_path / "homdel.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], recs)
    body = _call_body(chr11_fa, bam)

    def nt(p, n=1):
        return "".join(_NT[int(b)] for b in ref4[p:p + n])

    expected = {
        f"chr11\t{dd}\t.\t{nt(dd - 1, 3)}\t{nt(dd - 1)}\t60"
        f"\tPASS\tCLEAN;END={dd + 2}\tGT:DP:AD:VAF:GQ\t1|1:5:0,5:1.000:15",
    }
    assert set(body) == expected
