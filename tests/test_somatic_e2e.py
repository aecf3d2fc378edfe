"""Somatic/mosaic mode (-s -T) end-to-end smoke: the full somatic stack
(candidate promotion, TE annotation, noisy SV mining, hard filters) runs
over real data, and germline output stays stable."""

import io

import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call

TE_FA = "/root/reference/anno/AluY_L1_SVA_cons_noPA.fa"
REGION = "chr11:1250000-1330000"


def _call(chr11_fa, hifi_bam, somatic):
    import os
    if somatic and not os.path.exists(TE_FA):
        pytest.skip("TE consensus FASTA unavailable")
    opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[hifi_bam],
                        regions=[REGION], use_device=False,
                        out_somatic=somatic,
                        te_seq_fn=TE_FA if somatic else None)
    buf = io.StringIO()
    run_call(opt, buf, "test")
    return [l for l in buf.getvalue().splitlines() if not l.startswith("#")]


def test_somatic_mode_runs_and_keeps_germline(chr11_fa, hifi_bam):
    som = _call(chr11_fa, hifi_bam, True)
    germ = _call(chr11_fa, hifi_bam, False)
    som_only = [l for l in som if "SOMATIC" in l.split("\t")[7]]
    germ_like = [l for l in som if "SOMATIC" not in l.split("\t")[7]]
    # germline records must survive somatic mode unchanged (HG002 is a
    # germline sample; the hard-filter stack should emit few/no somatic)
    assert germ_like == germ
    # snapshot-style lock: the germline HG002 slice currently yields ZERO
    # somatic calls through the hard-filter stack; a change here needs the
    # same scrutiny as a snapshot update
    assert som_only == []
