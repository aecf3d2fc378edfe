"""Micro-parity, third battery: somatic (-s) record classes with exact
hand-derived bytes (round-4 review missing item 2: no somatic record class
had expected bytes derived from the C formulas by hand).

Covered record classes:
  * phased somatic SNV — SOMATIC INFO flag, VAF/QUAL/GQ from the C
    binomial formulas, PS from the elected phase set
    (/root/reference/src/vcf_utils.c:97-270, assign_hap.c:1399-1429,
    collect_var.c:2857-2895);
  * the same record with ALTREADS (output_somatic_var_rnames,
    vcf_utils.c:230-260): carrier read names in chunk (sorted-read) order;
  * somatic SV INS with TSD/POLYALEN (+ MEI/REPNAME when the TE FASTA is
    available) through the noisy-region private-indel mining path
    (collect_var.c:2446-2586, align.c:32-83).

QUAL/GQ hand-math (cal_var_QUAL1 / cal_sample_GQ, collect_var.c:1435-1457,
log_p=-3, log_1p=log10(0.999), log_2=0.301023):

  DP 12, AD 10,2 (somatic):  QUAL=int(60.043)=60,
      PL=[60, int(36.123)=36, int(300.009)=300] -> GQ=60-36=24
  DP 12, AD 6,6 (germline het scaffold): QUAL=int(180.026)->cap 60,
      PL=[180,36,180] -> GQ=144 -> cap 60

Write-time somatic refilter (vcf_utils.c:108-114): somatic records need
AD[1] >= min_somatic_te_dp(1) and (AD[1] >= min_alt_dp(2) or a TSD) —
AD[1]=2 passes both arms.
"""

import io
import os

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call
from longcalld_tpu.io.fasta import FastaFile
from longcalld_tpu.utils.sdust import sdust_native

from util_bam import make_record, write_bam

REF_BEG = 150_000
SPAN = 9_000
_NT = "ACGT"
TE_FA = "/root/reference/anno/AluY_L1_SVA_cons_noPA.fa"


def _no_hp(ref4, p, w=8):
    s = ref4[p - w:p + w]
    return all(not (s[i] == s[i + 1] == s[i + 2]) for i in range(len(s) - 2))


def _not_low_comp(ref4, p, w=30):
    return len(sdust_native(ref4[p - w:p + w].copy(), 5, 20)) == 0


def _pick(ref4, start, pred):
    p = start
    while not pred(p):
        p += 1
    return p


def _nt(ref4, p, n=1):
    return "".join(_NT[int(b)] for b in ref4[p:p + n])


def _build_read(ref4, carries_het, het_snp, carries_som, som_pos, som_alt,
                ins_at=-1, ins_seq=None):
    from longcalld_tpu.io.bam import CDIFF, CEQUAL, CINS
    seq, cig = [], []

    def push(op, ln):
        if cig and cig[-1][0] == op:
            cig[-1][1] += ln
        else:
            cig.append([op, ln])

    for i in range(REF_BEG, REF_BEG + SPAN):
        b = int(ref4[i])
        if carries_het and i == het_snp:
            seq.append((b + 1) % 4)
            push(CDIFF, 1)
        elif carries_som and i == som_pos and som_alt is not None:
            seq.append(som_alt)
            push(CDIFF, 1)
        else:
            seq.append(b)
            push(CEQUAL, 1)
            if carries_som and i == ins_at and ins_seq is not None:
                seq.extend(int(x) for x in ins_seq)
                push(CINS, len(ins_seq))
    return np.array(seq, dtype=np.uint8), [(o, ln) for o, ln in cig]


def _make_scene(chr11_fa, tmp_path, som_pos=None, som_alt=None,
                ins_at=-1, ins_seq=None, n_reads=12, carriers=(0, 3)):
    """12 full-span reads, 6 per hap; one germline het SNP (hap-1) for
    phasing; somatic payload on `carriers` (hap-1 reads, one per strand)."""
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    het = _pick(ref4, REF_BEG + 2_000, lambda p: _no_hp(ref4, p))
    recs = []
    for k in range(n_reads):
        hap1 = k < n_reads // 2
        seq4, cigar = _build_read(ref4, hap1, het, k in carriers,
                                  som_pos if som_pos else -1, som_alt,
                                  ins_at, ins_seq)
        recs.append(make_record(0, REF_BEG, f"sm{k:02d}", cigar, seq4,
                                np.full(len(seq4), 30, dtype=np.uint8),
                                mapq=60, flag=16 if k % 2 else 0))
    bam = str(tmp_path / "som_parity.bam")
    write_bam(bam, ["chr11"], [fa.seq_len("chr11")], recs)
    return ref4, het, bam


def _call(chr11_fa, bam, rnames=False, te_fn=None):
    opt = CallOpts.hifi(
        ref_fa_fn=chr11_fa, in_bam_fns=[bam], use_device=False,
        out_somatic=True, te_seq_fn=te_fn,
        output_somatic_var_rnames=rnames,
        regions=[f"chr11:{REF_BEG + 1}-{REF_BEG + SPAN}"])
    buf = io.StringIO()
    run_call(opt, buf, "test")
    return [ln for ln in buf.getvalue().splitlines()
            if not ln.startswith("#")]


def _som_site(ref4):
    """Clean somatic SNV site: non-HP, non-low-complexity, far from the
    het scaffold."""
    return _pick(ref4, REF_BEG + 6_000,
                 lambda p: _no_hp(ref4, p) and _not_low_comp(ref4, p))


@pytest.mark.parametrize("rnames", [False, True])
def test_phased_somatic_snv_record_exact(chr11_fa, tmp_path, rnames):
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    sp = _som_site(ref4)
    som_alt = (int(ref4[sp]) + 1) % 4
    ref4, het, bam = _make_scene(chr11_fa, tmp_path, som_pos=sp,
                                 som_alt=som_alt)
    body = _call(chr11_fa, bam, rnames=rnames)

    germ = next(ln for ln in body if int(ln.split("\t")[1]) == het + 1)
    gt = germ.split("\t")[9].split(":")[0]
    assert gt in ("0|1", "1|0")
    ps = het + 1

    som_fmt = "GT:DP:AD:VAF:GQ:PS" + (":ALTREADS" if rnames else "")
    # carriers sm00/sm03 share (pos, end), so the 4-key read sort
    # (sort_chunk_reads, bam_utils.c:1641-1656) orders them by qname
    som_sample = f"{gt}:12:10,2:0.167:24:{ps}" + \
        (":sm00,sm03" if rnames else "")
    expected = {
        # germline scaffold: AD 6,6 -> QUAL cap 60, GQ cap 60
        f"chr11\t{het + 1}\t.\t{_nt(ref4, het)}"
        f"\t{_NT[(ref4[het] + 1) % 4]}\t60\tPASS\tCLEAN;END={het + 1}"
        f"\tGT:DP:AD:VAF:GQ:PS\t{gt}:12:6,6:0.500:60:{ps}",
        # the somatic record: SOMATIC flag, VAF 2/12 -> 0.167, QUAL 60,
        # GQ 24, PS = the elected (only) phase set; carriers sit on the
        # same hap as the germline alt, so GT matches the scaffold's
        f"chr11\t{sp + 1}\t.\t{_nt(ref4, sp)}\t{_NT[som_alt]}\t60"
        f"\tPASS\tSOMATIC;END={sp + 1}\t{som_fmt}\t{som_sample}",
    }
    assert set(body) == expected


def _pick_sv_anchor(ref4, body0, body1):
    """Anchor for a TSD-structured insertion: ref[a] != A (blocks the
    1-step left shift of a polyA-tailed gap), non-HP context, and the
    insertion body's first two bases mismatch flank positions 8/9 (two
    consecutive mismatches pin the <=1-mismatch TSD scan at exactly 8,
    align.c:38-49)."""
    return _pick(ref4, REF_BEG + 6_000,
                 lambda p: _no_hp(ref4, p) and ref4[p] != 0
                 and ref4[p + 9] != body0 and ref4[p + 10] != body1)


def _sv_scene_expected(ref4, het, gt, sv_a, ins_seq, mei_name=None):
    ps = het + 1
    tsd_str = _nt(ref4, sv_a + 1, 8)
    sv_alt = _nt(ref4, sv_a) + "".join(_NT[int(b)] for b in ins_seq)
    flags = "SOMATIC;MEI;" if mei_name else "SOMATIC;"
    info = (f"{flags}END={sv_a + 1};SVTYPE=INS;SVLEN={len(ins_seq)};"
            f"TSD={tsd_str};TSDLEN=8;POLYALEN=25;TSDPOS1={sv_a + 2}")
    if mei_name:
        info += f";REPNAME=+{mei_name}"
    return {
        # germline scaffold at 10 reads: AD 5,5 -> QUAL cap 60, GQ cap 60
        f"chr11\t{het + 1}\t.\t{_nt(ref4, het)}"
        f"\t{_NT[(ref4[het] + 1) % 4]}\t60\tPASS\tCLEAN;END={het + 1}"
        f"\tGT:DP:AD:VAF:GQ:PS\t{gt}:10:5,5:0.500:60:{ps}",
        # somatic SV: DP 10 AD 8,2 -> QUAL int(60.035)=60,
        # PL=[60, int(30.102)=30, int(240.009)=240] -> GQ=30; VAF 0.200
        f"chr11\t{sv_a + 1}\t.\t{_nt(ref4, sv_a)}\t{sv_alt}\t60"
        f"\tPASS\t{info}\tGT:DP:AD:VAF:GQ:PS\t{gt}:10:8,2:0.200:30:{ps}",
    }


def test_somatic_sv_ins_tsd_record_exact(chr11_fa, tmp_path):
    """TSD+polyA-structured 63 bp insertion private to 2 of 5 hap-1 reads
    (10 reads total: the 2-carrier noisy region needs a >=0.2 noisy-read
    ratio, collect_var.c:557-642): mined by the noisy-region somatic SV
    path, emitted SOMATIC with SVTYPE/SVLEN/TSD/TSDLEN/POLYALEN/TSDPOS1 —
    every byte hand-derived."""
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    # body in {C,G,T}: no A keeps POLYALEN pinned at the planted 25
    rng = np.random.default_rng(11)
    body = rng.integers(1, 4, 30).astype(np.uint8)
    sv_a = _pick_sv_anchor(ref4, int(body[0]), int(body[1]))
    tsd = ref4[sv_a + 1: sv_a + 9].copy()
    ins_seq = np.concatenate([tsd, body, np.zeros(25, np.uint8)])

    ref4, het, bam = _make_scene(chr11_fa, tmp_path, ins_at=sv_a,
                                 ins_seq=ins_seq, n_reads=10,
                                 carriers=(0, 3))
    body_v = _call(chr11_fa, bam)
    germ = next(ln for ln in body_v if int(ln.split("\t")[1]) == het + 1)
    gt = germ.split("\t")[9].split(":")[0]
    assert gt in ("0|1", "1|0")
    assert set(body_v) == _sv_scene_expected(ref4, het, gt, sv_a, ins_seq)


def test_somatic_mei_record_exact(chr11_fa, tmp_path):
    """Alu-shaped somatic insertion with -T: TSD(8) + 250 bp of the AluY
    consensus + polyA(25).  The record must additionally carry the MEI
    flag and REPNAME=+AluY (check_te_seq 15-mer classification,
    kmer.c:218-248; INFO layout vcf_utils.c:188-195)."""
    if not os.path.exists(TE_FA):
        pytest.skip("TE consensus FASTA unavailable")
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    nt4 = {"A": 0, "C": 1, "G": 2, "T": 3}
    alu = []
    with open(TE_FA) as fh:
        in_alu = False
        for line in fh:
            if line.startswith(">"):
                if in_alu:
                    break
                in_alu = line[1:].split()[0] == "AluY"
            elif in_alu:
                alu.extend(nt4.get(c.upper(), 0) for c in line.strip())
    frag = np.asarray(alu[:250], dtype=np.uint8).copy()
    # trim trailing A's so the polyA scan stops exactly at the planted 25
    end = len(frag)
    while end > 0 and frag[end - 1] == 0:
        end -= 1
    frag = frag[:end]
    sv_a = _pick_sv_anchor(ref4, int(frag[0]), int(frag[1]))
    tsd = ref4[sv_a + 1: sv_a + 9].copy()
    ins_seq = np.concatenate([tsd, frag, np.zeros(25, np.uint8)])

    ref4, het, bam = _make_scene(chr11_fa, tmp_path, ins_at=sv_a,
                                 ins_seq=ins_seq, n_reads=10,
                                 carriers=(0, 3))
    body_v = _call(chr11_fa, bam, te_fn=TE_FA)
    germ = next(ln for ln in body_v if int(ln.split("\t")[1]) == het + 1)
    gt = germ.split("\t")[9].split(":")[0]
    assert gt in ("0|1", "1|0")
    assert set(body_v) == _sv_scene_expected(ref4, het, gt, sv_a, ins_seq,
                                             mei_name="AluY")
