"""--refine-aln: noisy-region realignments spliced into digars and written
back as refined BAM records (pos/CIGAR/NM/MD)."""

import io
import re

import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call
from longcalld_tpu.io.bam import (CDEL, CDIFF, CEQUAL, CINS, CSOFT_CLIP,
                                  BamReader)

REGION = "chr11:1250000-1330000"


def _run(chr11_fa, hifi_bam, tmp_path, refine):
    opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[hifi_bam],
                        regions=[REGION], use_device=False,
                        refine_bam=refine,
                        out_bam_fn=str(tmp_path / f"refine{int(refine)}.bam")
                        if refine else None)
    buf = io.StringIO()
    run_call(opt, buf, "test")
    body = [l for l in buf.getvalue().splitlines() if not l.startswith("#")]
    return body, opt.out_bam_fn


@pytest.fixture(scope="module")
def refined(chr11_fa, hifi_bam, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refine")
    return _run(chr11_fa, hifi_bam, tmp, True)


def test_vcf_unchanged_by_refine(chr11_fa, hifi_bam, tmp_path, refined):
    plain, _ = _run(chr11_fa, hifi_bam, tmp_path, False)
    assert refined[0] == plain


def test_refined_bam_consistency(hifi_bam, refined):
    _, out_bam = refined
    orig = {}
    for rec in BamReader(hifi_bam):
        orig[rec.qname] = rec
    n = n_changed = 0
    for rec in BamReader(out_bam):
        n += 1
        cig = rec.cigar_array()
        q_consume = int(cig[(cig[:, 0] == CEQUAL) | (cig[:, 0] == CDIFF)
                            | (cig[:, 0] == CINS)
                            | (cig[:, 0] == CSOFT_CLIP), 1].sum())
        assert q_consume == rec.l_seq, rec.qname
        ref_consume = int(cig[(cig[:, 0] == CEQUAL) | (cig[:, 0] == CDIFF)
                              | (cig[:, 0] == CDEL), 1].sum())
        nm = rec.get_tag("NM")
        if nm is not None:
            expect_nm = int(cig[(cig[:, 0] == CDIFF) | (cig[:, 0] == CINS)
                                | (cig[:, 0] == CDEL), 1].sum())
            assert nm == expect_nm, rec.qname
        md = rec.get_tag("MD")
        if md is not None:
            covered = sum(int(x) for x in re.findall(r"\d+", md))
            covered += len(re.findall(r"[A-Z]", md))
            assert covered == ref_consume, (rec.qname, md)
        o = orig[rec.qname]
        if rec.pos != o.pos or rec.cigar_array().tolist() != \
                o.cigar_array().tolist():
            n_changed += 1
            # refined reads must still span the same read bases
            assert rec.l_seq == o.l_seq
    assert n > 50
    # the workload's noisy regions must actually refine some alignments
    assert n_changed > 0
