"""FN-cause classification harness (round-4 review missing item 3): on
the 2 Mb synthetic diploid scene every false negative must land in a
pipeline-cause bucket, and the dominant bucket must be the
reference-faithful >50 kb noisy-region skip (collect_var.c:2653)."""

import io
import sys

import numpy as np

sys.path.insert(0, "tests")

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import _open_aln, run_call
from longcalld_tpu.io.fasta import FastaFile

from fnclassify import classify_fn_causes
from synthcontig import (build_truth, evaluate_f1, write_synth_bam,
                         write_synth_fasta)


def test_every_fn_gets_a_cause_bucket(tmp_path, chr11_fa):
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    ref4 = np.where(ref4 > 3, 0, ref4).astype(np.uint8)
    rng = np.random.default_rng(42)
    beg, end = 10_000, len(ref4) - 10_000
    truth = build_truth(rng, ref4, beg, end)

    fa_fn = str(tmp_path / "synth.fa")
    bam_fn = str(tmp_path / "synth.bam")
    write_synth_fasta(fa_fn, "chr21", ref4)
    write_synth_bam(bam_fn, "chr21", len(ref4), ref4, truth, beg, end,
                    coverage=20, read_len=12_000, err=0.003, seed=43)

    opt = CallOpts.hifi(ref_fa_fn=fa_fn, in_bam_fns=[bam_fn],
                        use_device=False, n_threads=4)
    out = io.StringIO()
    run_call(opt, out, "fn-test")
    body = [ln for ln in out.getvalue().splitlines()
            if not ln.startswith("#")]
    res, fns = evaluate_f1(body, truth, beg, end, ref4, return_fns=True)
    n_fns = res["snv"]["fn"] + res["indel"]["fn"] + res["sv"]["fn"]
    assert n_fns > 0, "scene regressed to perfect recall; reseed the test"

    causes = classify_fn_causes(opt, FastaFile(fa_fn),
                                [_open_aln(bam_fn, fa_fn)], fns, "chr21",
                                len(ref4))
    # every FN is accounted for — nothing falls through the classifier
    assert causes["total_fns"] == n_fns
    assert sum(b["n"] for b in causes["buckets"].values()) == n_fns

    # the dominant bucket on this scene is the noisy-region loss: chr11's
    # subtelomeric low-complexity head chains a >50 kb region that the
    # pipeline skips whole, exactly like the reference
    # (collect_var.c:2653-2663, max_noisy_reg_len 50 kb) after
    # classification already dropped the contained candidates
    top = next(iter(causes["buckets"]))
    assert top == "dropped_in_noisy_reassembly", causes["buckets"]
    # the remaining buckets are small: depth/edge effects, low-AF
    # demotion (reference-faithful: var_is_cand_somatic,
    # collect_var.c:796-811), and representation mismatches
    rest = n_fns - causes["buckets"][top]["n"]
    assert rest <= n_fns * 0.6
