"""Reference-faithful genotype parity: a hom site covered by only ONE
haplotype's reads is emitted as a PHASED HET, because an evidence-free
haplotype consensus defaults to the REF allele
(/root/reference/src/collect_var.c:1497-1499:
``if (hap2_alle == -1) hap2_alle = LONGCALLD_REF_ALLELE``), mirrored in
longcalld_tpu/core/genotype.py.  Found by round-4 soak seed 10326;
locked here as a deterministic construction so the behavior cannot
silently drift toward the naive 1/1 call."""

import io
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from util_bam import make_record, sim_read, write_bam

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call
from longcalld_tpu.io.fasta import FastaFile

CHR11_FA = "/root/reference/test_data/chr11_2M.fa"
BEG = 1_350_000


def test_hom_site_covered_by_one_hap_emits_phased_het():
    fa = FastaFile(CHR11_FA)
    fa_len = fa.seq_len("chr11")
    ref4 = fa.fetch_nt4("chr11", 0, fa_len - 1)
    rng = np.random.default_rng(0)

    het_pos = BEG + 700        # phase anchor, covered by both haps
    hom_pos = BEG + 2400       # covered ONLY by hap-1 reads
    variants = {
        het_pos: ("snv", (int(ref4[het_pos]) + 1) % 4, "het1"),
        hom_pos: ("snv", (int(ref4[hom_pos]) + 1) % 4, "hom"),
    }

    recs = []
    k = 0
    for hap, length, n in ((1, 3_000, 8), (2, 1_500, 8)):
        for _ in range(n):
            seq4, cigar = sim_read(rng, ref4, BEG, length, hap, variants,
                                   err=0.0)
            recs.append((BEG, make_record(
                0, BEG, f"r{k:02d}", cigar, seq4,
                np.full(len(seq4), 35, dtype=np.uint8), mapq=60,
                flag=16 if k % 4 >= 2 else 0)))
            k += 1
    with tempfile.TemporaryDirectory() as tmp:
        bam = os.path.join(tmp, "onehap.bam")
        write_bam(bam, ["chr11"], [fa_len], [r[1] for r in recs])
        opt = CallOpts.hifi(
            ref_fa_fn=CHR11_FA, in_bam_fns=[bam], use_device=False,
            regions=[f"chr11:{BEG + 1}-{BEG + 4_000}"])
        buf = io.StringIO()
        run_call(opt, buf, "onehap")
    rows = {}
    for ln in buf.getvalue().splitlines():
        if ln.startswith("#"):
            continue
        f = ln.split("\t")
        rows[int(f[1])] = dict(zip(f[8].split(":"), f[9].split(":")))

    assert het_pos + 1 in rows, "het anchor must be called"
    assert hom_pos + 1 in rows, "the one-hap hom site must be called"
    d = rows[hom_pos + 1]
    # the reference-faithful emission: phased het with ZERO ref support
    assert "|" in d["GT"], "one-hap hom must stay phased"
    assert sorted(d["GT"].split("|")) == ["0", "1"], d["GT"]
    assert d["AD"].split(",")[0] == "0", d
    assert "PS" in d, d
