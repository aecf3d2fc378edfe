"""Hand-computed expected-record parity on micro BAMs.

Each case plants a single variant class (het SNP pair, het INS, het DEL,
hom SNP) on error-free reads and asserts the EXACT VCF record, with QUAL
and GQ computed BY HAND from the reference's C formulas
(cal_var_QUAL1 / cal_sample_GQ, /root/reference/src/collect_var.c:1435-1457,
constants from src/call_var_main.c:217-218: log_p=-3,
log_1p=log10(0.999), log_2=0.301023 hand-rounded):

  depth 5, AD ref=3 alt=2 (every het case below):
    QUAL = int(-10*(3*log10(.999) + 2*(-3))) = int(60.013) = 60 (= cap)
    PL   = [int(60.013), int(10*5*0.301023), int(-10*(3*(-3)+2*log10(.999)))]
         = [60, 15, 90]   ->  GQ = min(60, 60-15) = 45
  depth 5, AD ref=0 alt=5 (hom SNP):
    QUAL = int(-10*5*(-3)) = 150 -> capped 60
    PL   = [150, int(10*5*0.301023), int(-10*5*log10(.999))] = [150, 15, 0]
         ->  GQ = 15 - 0 = 15

Phase-set id: segment-starting var's POS (SNP) / POS-1 (indel)
(assign_hap.c:392-397) -> every het record carries PS = first het SNP POS.
"""

import io

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call
from longcalld_tpu.io.bam import CDEL, CDIFF, CEQUAL, CINS
from longcalld_tpu.io.fasta import FastaFile

from util_bam import make_record, write_bam

REF_BEG = 100_000      # 0-based read span start on chr11
SPAN = 12_000
N_HAP_A = 2            # reads carrying the planted het alts
N_HAP_B = 3            # all-reference reads

_NT = "ACGT"


def _no_hp(ref4, p, w=6):
    """True when ref4[p-w:p+w] has no 3-run (avoids homopolymer-indel
    gating and representation shifts)."""
    s = ref4[p - w:p + w]
    return all(not (s[i] == s[i + 1] == s[i + 2]) for i in range(len(s) - 2))


def _pick(ref4, start, pred):
    p = start
    while not pred(p):
        p += 1
    return p


@pytest.fixture(scope="module")
def planted(chr11_fa, tmp_path_factory):
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)

    snp1 = _pick(ref4, REF_BEG + 2_000, lambda p: _no_hp(ref4, p))
    snp2 = _pick(ref4, REF_BEG + 4_000, lambda p: _no_hp(ref4, p))
    # INS between A and A+1: forbid either-direction shifting
    ins_a = _pick(ref4, REF_BEG + 6_000, lambda p: _no_hp(ref4, p))
    ins_seq = np.array([(ref4[ins_a + 1] + 1) % 4, 1, 2,
                        (ref4[ins_a] + 1) % 4], dtype=np.uint8)
    # DEL of D..D+2: forbid shifting (distinct context on both sides)
    del_d = _pick(ref4, REF_BEG + 8_000,
                  lambda p: _no_hp(ref4, p)
                  and ref4[p - 1] != ref4[p + 2] and ref4[p] != ref4[p + 3])
    hom = _pick(ref4, REF_BEG + 10_000, lambda p: _no_hp(ref4, p))

    def build_read(hap):
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
            if i == hom or (hap == 1 and i in (snp1, snp2)):
                seq.append((b + 1) % 4)
                push(CDIFF, 1)
            elif hap == 1 and i == ins_a:
                seq.append(b)
                push(CEQUAL, 1)
                seq.extend(int(x) for x in ins_seq)
                push(CINS, len(ins_seq))
            elif hap == 1 and i == del_d:
                push(CDEL, 3)
                i += 3
                continue
            else:
                seq.append(b)
                push(CEQUAL, 1)
            i += 1
        return np.array(seq, dtype=np.uint8), [(o, l) for o, l in cig]

    recs = []
    for k in range(N_HAP_A + N_HAP_B):
        hap = 1 if k < N_HAP_A else 2
        seq4, cigar = build_read(hap)
        flag = 16 if k in (0, 2, 3) else 0   # alt reads: 1 rev 1 fwd
        quals = np.full(len(seq4), 30, dtype=np.uint8)
        recs.append(make_record(0, REF_BEG, f"micro{k}_h{hap}", cigar,
                                seq4, quals, mapq=60, flag=flag))
    path = str(tmp_path_factory.mktemp("micro") / "micro.bam")
    write_bam(path, ["chr11"], [fa.seq_len("chr11")], recs)
    return dict(bam=path, ref4=ref4, snp1=snp1, snp2=snp2, ins_a=ins_a,
                ins_seq=ins_seq, del_d=del_d, hom=hom)


@pytest.fixture(scope="module")
def vcf_body(chr11_fa, planted):
    opt = CallOpts.hifi(
        ref_fa_fn=chr11_fa, in_bam_fns=[planted["bam"]], use_device=False,
        regions=[f"chr11:{REF_BEG + 1}-{REF_BEG + SPAN}"])
    buf = io.StringIO()
    run_call(opt, buf, "test")
    return [l for l in buf.getvalue().splitlines() if not l.startswith("#")]


def test_exact_record_set(planted, vcf_body):
    ref4 = planted["ref4"]
    snp1, snp2 = planted["snp1"], planted["snp2"]
    ins_a, del_d, hom = planted["ins_a"], planted["del_d"], planted["hom"]
    ins_seq = planted["ins_seq"]

    # GT orientation (which EM hap got the alts) is seed-dependent; all het
    # records must share one orientation
    first = next(l for l in vcf_body if int(l.split("\t")[1]) == snp1 + 1)
    gt = first.split("\t")[9].split(":")[0]
    assert gt in ("0|1", "1|0")
    ps = snp1 + 1                       # PS = first het SNP POS

    def nt(p, n=1):
        return "".join(_NT[int(b)] for b in ref4[p:p + n])

    het = f"{gt}:5:3,2:0.400:45:{ps}"
    expected = {
        f"chr11\t{snp1 + 1}\t.\t{nt(snp1)}\t{_NT[(ref4[snp1] + 1) % 4]}\t60"
        f"\tPASS\tCLEAN;END={snp1 + 1}\tGT:DP:AD:VAF:GQ:PS\t{het}",
        f"chr11\t{snp2 + 1}\t.\t{nt(snp2)}\t{_NT[(ref4[snp2] + 1) % 4]}\t60"
        f"\tPASS\tCLEAN;END={snp2 + 1}\tGT:DP:AD:VAF:GQ:PS\t{het}",
        # INS: POS = anchor (ins_a, 1-based), REF = anchor, ALT = anchor+ins
        f"chr11\t{ins_a + 1}\t.\t{nt(ins_a)}"
        f"\t{nt(ins_a)}{''.join(_NT[int(b)] for b in ins_seq)}\t60"
        f"\tPASS\tCLEAN;END={ins_a + 1}\tGT:DP:AD:VAF:GQ:PS\t{het}",
        # DEL: POS = anchor (del_d-1, 1-based), REF = anchor+deleted
        f"chr11\t{del_d}\t.\t{nt(del_d - 1, 4)}\t{nt(del_d - 1)}\t60"
        f"\tPASS\tCLEAN;END={del_d + 3}\tGT:DP:AD:VAF:GQ:PS\t{het}",
        f"chr11\t{hom + 1}\t.\t{nt(hom)}\t{_NT[(ref4[hom] + 1) % 4]}\t60"
        f"\tPASS\tCLEAN;END={hom + 1}\tGT:DP:AD:VAF:GQ\t1|1:5:0,5:1.000:15",
    }
    assert set(vcf_body) == expected
