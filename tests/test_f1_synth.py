"""Truth-set F1 on a synthetic diploid contig (round-3 review item 7).

tests/synthcontig.py plants SNVs (1/kb), small indels (1/8kb) and SV
ins/dels (5/Mb) into real chr11 genomic sequence, simulates ~20x diploid
HiFi-like reads (12 kb, 0.3% mismatch error, M-CIGARs so the ref-compare
digar source recomputes everything), runs the full pipeline, and scores
calls against the planted truth with hap.py-style left-normalization.

Measured at 20 Mb scale (bench.py F1 leg): SNV F1 0.983, indel 0.984,
SV 0.988, precision 1.0 everywhere.  This test locks a 2 Mb slice of the
same scene at slightly looser thresholds (smaller denominators).
"""

import io
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call
from longcalld_tpu.io.fasta import FastaFile

from synthcontig import (build_truth, evaluate_f1, write_synth_bam,
                         write_synth_fasta)


@pytest.mark.parametrize("seed", [42, 1234])
def test_f1_on_synthetic_diploid_contig(tmp_path, chr11_fa, seed):
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    ref4 = np.where(ref4 > 3, 0, ref4).astype(np.uint8)
    rng = np.random.default_rng(seed)
    beg, end = 10_000, len(ref4) - 10_000
    truth = build_truth(rng, ref4, beg, end)
    assert len(truth) > 1500

    fa_fn = str(tmp_path / "synth.fa")
    bam_fn = str(tmp_path / "synth.bam")
    write_synth_fasta(fa_fn, "chr21", ref4)
    n = write_synth_bam(bam_fn, "chr21", len(ref4), ref4, truth, beg, end,
                        coverage=20, read_len=12_000, err=0.003,
                        seed=seed + 1)
    assert n > 2000

    opt = CallOpts.hifi(ref_fa_fn=fa_fn, in_bam_fns=[bam_fn],
                        use_device=False, n_threads=4)
    out = io.StringIO()
    run_call(opt, out, "f1-test")
    body = [ln for ln in out.getvalue().splitlines()
            if not ln.startswith("#")]
    res = evaluate_f1(body, truth, beg, end, ref4)

    assert res["snv"]["f1"] >= 0.95, res["snv"]
    assert res["indel"]["f1"] >= 0.93, res["indel"]
    assert res["sv"]["f1"] >= 0.80, res["sv"]
    assert res["snv"]["precision"] >= 0.99, res["snv"]
    assert res["indel"]["precision"] >= 0.97, res["indel"]
