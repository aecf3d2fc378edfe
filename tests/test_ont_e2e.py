"""ONT preset end-to-end on simulated noisy long reads: het SNV calling +
phasing and a 50 bp insertion SV through the noisy-region re-assembly path,
with ONT-specific knobs (25 bp sliding window, Fisher strand-bias gate)."""

import io

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call
from longcalld_tpu.io.bam import CDIFF, CEQUAL, CINS
from longcalld_tpu.io.fasta import FastaFile

from util_bam import make_record, write_bam

REF_BEG = 1_300_000          # 0-based window start on chr11
REF_LEN = 16_000
READ_LEN = 9_000
N_READS = 24
ERR = 0.035                  # per-base substitution error (ONT-ish)

# absolute 0-based positions: het SNVs on haplotype 1, 50bp INS on hap 2
SNVS = tuple(REF_BEG + o for o in (2_000, 5_500, 9_000, 13_000))
INS_POS = REF_BEG + 7_400
INS_SEQ = "ACGTTGCAAGGCTTACGGATCCAGTTCAGGACTTGCAACCGGTTAAGCTA"


def _sim_read(rng, ref4, start, length, hap):
    """Read built from ref4[start:start+length] with planted variants +
    random substitutions; returns (pos0, seq4, cigar)."""
    seq = []
    cig = []

    def push(op, ln):
        if ln <= 0:
            return
        if cig and cig[-1][0] == op:
            cig[-1][1] += ln
        else:
            cig.append([op, ln])

    i = start
    end = start + length
    while i < end:
        base = int(ref4[i])
        planted = None
        if hap == 1 and i in SNVS:
            planted = "snv"
        if hap == 2 and i == INS_POS:
            planted = "ins"
        if planted == "snv":
            seq.append((base + 1) % 4)
            push(CDIFF, 1)
            i += 1
            continue
        if planted == "ins":
            # anchor base then insertion
            seq.append(base)
            push(CEQUAL, 1)
            for ch in INS_SEQ:
                seq.append("ACGT".index(ch))
            push(CINS, len(INS_SEQ))
            i += 1
            continue
        if rng.random() < ERR:
            seq.append((base + 1 + int(rng.integers(3))) % 4)
            push(CDIFF, 1)
        else:
            seq.append(base)
            push(CEQUAL, 1)
        i += 1
    return start, np.array(seq, dtype=np.uint8), [(op, ln) for op, ln in cig]


@pytest.fixture(scope="module")
def ont_bam(chr11_fa, tmp_path_factory):
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    rng = np.random.default_rng(7)
    recs = []
    for k in range(N_READS):
        hap = 1 + (k % 2)
        start = REF_BEG + int(rng.integers(0, REF_LEN - READ_LEN))
        pos0, seq4, cigar = _sim_read(rng, ref4, start, READ_LEN, hap)
        flag = 16 if k % 4 >= 2 else 0   # both strands on both haps
        quals = np.full(len(seq4), 25, dtype=np.uint8)
        recs.append((pos0,
                     make_record(0, pos0, f"ont{k:03d}_h{hap}", cigar, seq4,
                                 quals, mapq=60, flag=flag)))
    recs.sort(key=lambda r: r[0])
    path = str(tmp_path_factory.mktemp("ont") / "ont.bam")
    write_bam(path, ["chr11"], [fa.seq_len("chr11")], [r[1] for r in recs])
    return path


def test_ont_calls_snvs_and_ins_sv(chr11_fa, ont_bam):
    opt = CallOpts.ont(
        ref_fa_fn=chr11_fa, in_bam_fns=[ont_bam], use_device=False,
        regions=[f"chr11:{REF_BEG + 1}-{REF_BEG + REF_LEN}"])
    buf = io.StringIO()
    run_call(opt, buf, "test")
    body = [l for l in buf.getvalue().splitlines() if not l.startswith("#")]
    by_pos = {}
    for l in body:
        f = l.split("\t")
        by_pos[int(f[1])] = f

    hap1_gts = set()
    for p in SNVS:
        assert p + 1 in by_pos, f"planted SNV at {p + 1} missed"
        f = by_pos[p + 1]
        gt = dict(zip(f[8].split(":"), f[9].split(":")))["GT"]
        assert gt in ("0|1", "1|0")
        hap1_gts.add(gt)
    # all hap-1 SNVs must phase onto the same haplotype
    assert len(hap1_gts) == 1

    ins = [f for p, f in by_pos.items()
           if len(f[4]) - len(f[3]) >= 45 and
           abs(p - (INS_POS + 1)) <= 20]
    assert ins, "planted 50bp INS missed"
    gt = dict(zip(ins[0][8].split(":"), ins[0][9].split(":")))["GT"]
    assert gt in ("0|1", "1|0")
    # and it must land on the opposite haplotype from the SNVs
    assert gt != hap1_gts.pop()
