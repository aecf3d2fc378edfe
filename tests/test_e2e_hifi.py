"""End-to-end clean-path calling on the bundled HG002 chr11 HiFi BAM.

These lock in the current behavior of the full pipeline (digar -> candidate
sites -> classification -> phasing -> genotypes -> VCF).
"""

import io
import re

import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call


@pytest.fixture(scope="module")
def vcf_lines(chr11_fa, hifi_bam):
    opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[hifi_bam],
                        use_device=False)
    buf = io.StringIO()
    n = run_call(opt, buf, "test")
    body = [l for l in buf.getvalue().splitlines() if not l.startswith("#")]
    assert n == len(body)
    return body


def test_calls_nonempty_and_sorted(vcf_lines):
    assert len(vcf_lines) > 200
    pos = [int(l.split("\t")[1]) for l in vcf_lines]
    assert pos == sorted(pos)
    # all within the covered region
    assert pos[0] > 1_200_000 and pos[-1] < 1_450_000


def test_gt_and_ps_fields(vcf_lines):
    n_het = n_hom = 0
    ps_values = set()
    for l in vcf_lines:
        fields = l.split("\t")
        fmt = fields[8].split(":")
        sample = fields[9].split(":")
        d = dict(zip(fmt, sample))
        gt = d["GT"]
        assert re.fullmatch(r"[01][/|][01]", gt)
        dp, ad = int(d["DP"]), d["AD"].split(",")
        assert dp >= 5
        assert int(ad[1]) >= 2
        if gt in ("0|1", "1|0"):
            n_het += 1
            assert "PS" in d
            ps_values.add(d["PS"])
        elif gt == "1|1":
            n_hom += 1
        vaf = float(d["VAF"])
        assert 0.0 <= vaf <= 1.0
    assert n_het > 100
    assert n_hom > 50
    # a ~200kb covered span should phase into few blocks
    assert 1 <= len(ps_values) <= 10


def test_snps_match_reference_bases(vcf_lines, chr11_fa):
    from longcalld_tpu.io.fasta import FastaFile
    fa = FastaFile(chr11_fa)
    for l in vcf_lines:
        f = l.split("\t")
        pos, ref = int(f[1]), f[3]
        fetched = fa.fetch("chr11", pos - 1, pos + len(ref) - 2).decode().upper()
        assert fetched == ref, f"REF mismatch at {pos}: {fetched} != {ref}"


def test_snapshot_vcf_exact(vcf_lines):
    """Golden-snapshot diff: any change to pipeline output must be
    intentional and reviewed (regenerate with tests/gen_snapshot.py)."""
    import pathlib
    snap = (pathlib.Path(__file__).parent / "data"
            / "hg002_chr11_hifi.vcf").read_text().splitlines()
    assert len(vcf_lines) == len(snap), \
        f"record count changed: {len(vcf_lines)} vs snapshot {len(snap)}"
    for got, want in zip(vcf_lines, snap):
        assert got == want
