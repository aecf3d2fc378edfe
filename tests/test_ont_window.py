"""ONT preset at full window scale (round-3 review item 8).

A realistic ONT-error BAM over one whole 500 kb window — ~1300 reads at
25x, 2.5% substitution error plus 1.5% homopolymer-biased indel error
(tests/synthcontig.apply_ont_errors), with planted SNV/indel/SV truth —
run through the full pipeline with every ONT knob live (25 bp noisy
window, 67% homopolymer-majority consensus rule, Fisher strand-bias
gate, ONT preset thresholds: /root/reference/src/call_var_main.c:113-126).

Locks three things:
* the exact output against a checked-in snapshot
  (tests/data/ont_window_500kb.vcf — regenerate with
  tests/gen_ont_snapshot.py after an INTENTIONAL change);
* truth-set F1 at ONT-grade thresholds (measured SNV 0.945, indel 0.916,
  SV 1.0);
* preset divergence: the same BAM under --hifi must call differently,
  proving the ONT knobs actually steer behavior at window scale (the
  per-knob fails-if-broken battery is tests/test_ont_adversarial.py).
"""

import io
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call
from longcalld_tpu.io.fasta import FastaFile

from synthcontig import (build_truth, evaluate_f1, write_synth_bam,
                         write_synth_fasta)

SNAP = pathlib.Path(__file__).resolve().parent / "data" / \
    "ont_window_500kb.vcf"
SEED = 11


def build_scene(tmp_path, chr11_fa):
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    ref4 = np.where(ref4 > 3, 0, ref4).astype(np.uint8)[:500_000]
    rng = np.random.default_rng(SEED)
    beg, end = 10_000, len(ref4) - 10_000
    truth = build_truth(rng, ref4, beg, end)
    fa_fn = str(tmp_path / "ont.fa")
    bam_fn = str(tmp_path / "ont.bam")
    write_synth_fasta(fa_fn, "chr21", ref4)
    n = write_synth_bam(bam_fn, "chr21", len(ref4), ref4, truth, beg, end,
                        coverage=25, read_len=9_000, err=0.025,
                        indel_err=0.015, seed=SEED + 1, qual=20)
    assert n > 1000
    return ref4, truth, beg, end, fa_fn, bam_fn


@pytest.fixture(scope="module")
def scene(tmp_path_factory, chr11_fa):
    return build_scene(tmp_path_factory.mktemp("ontwin"), chr11_fa)


def _call(ctor, fa_fn, bam_fn, **kw):
    opt = ctor(ref_fa_fn=fa_fn, in_bam_fns=[bam_fn], use_device=False,
               n_threads=2, host_procs=0, **kw)
    out = io.StringIO()
    run_call(opt, out, "ont-window")
    return [ln for ln in out.getvalue().splitlines()
            if not ln.startswith("#")]


@pytest.fixture(scope="module")
def ont_body(scene):
    """One ONT window-scale run shared by both tests (it is the module's
    most expensive call)."""
    _ref4, _truth, _beg, _end, fa_fn, bam_fn = scene
    return _call(CallOpts.ont, fa_fn, bam_fn)


def test_ont_window_snapshot_and_f1(scene, ont_body):
    ref4, truth, beg, end, fa_fn, bam_fn = scene
    body = ont_body
    assert body == SNAP.read_text().splitlines(), (
        "ONT window output changed; review and regenerate with "
        "tests/gen_ont_snapshot.py if intentional")
    res = evaluate_f1(body, truth, beg, end, ref4)
    assert res["snv"]["f1"] >= 0.92, res["snv"]
    assert res["indel"]["f1"] >= 0.85, res["indel"]
    assert res["sv"]["recall"] >= 0.5, res["sv"]
    assert res["snv"]["precision"] >= 0.98, res["snv"]


def test_ont_preset_diverges_from_hifi_at_window_scale(scene, ont_body):
    """The ONT knobs must steer behavior on this data: running the same
    ONT-error BAM with the HiFi preset (100 bp noisy window, no
    strand-bias gate, 50%-majority homopolymer rule) must not produce
    the same record set."""
    _ref4, _truth, _beg, _end, fa_fn, bam_fn = scene
    ont = ont_body
    hifi = _call(CallOpts.hifi, fa_fn, bam_fn)
    assert ont != hifi
    # and the divergence is substantive, not one boundary record
    ont_keys = {ln.split("\t")[1] + ":" + ln.split("\t")[4] for ln in ont}
    hifi_keys = {ln.split("\t")[1] + ":" + ln.split("\t")[4]
                 for ln in hifi}
    assert len(ont_keys ^ hifi_keys) >= 10


def test_ont_window_second_error_model_same_gates(tmp_path, chr11_fa):
    """Round-4 review item 7: the window-scale ONT e2e under a SECOND,
    independently-parameterized error model (apply_ont_errors_r10 —
    run-length-calibrated, deletion-dominated homopolymer profile, vs the
    first model's per-site placement) must pass the same F1 gates.  This
    de-correlates the ONT validation from the error model its author also
    wrote: the pipeline's ONT knobs must handle both error structures."""
    fa = FastaFile(chr11_fa)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    ref4 = np.where(ref4 > 3, 0, ref4).astype(np.uint8)[:500_000]
    rng = np.random.default_rng(SEED)
    beg, end = 10_000, len(ref4) - 10_000
    truth = build_truth(rng, ref4, beg, end)
    fa_fn = str(tmp_path / "ont_r10.fa")
    bam_fn = str(tmp_path / "ont_r10.bam")
    write_synth_fasta(fa_fn, "chr21", ref4)
    n = write_synth_bam(bam_fn, "chr21", len(ref4), ref4, truth, beg, end,
                        coverage=25, read_len=9_000, err=0.025,
                        indel_err=0.015, seed=SEED + 1, qual=20,
                        error_model="r10")
    assert n > 1000
    body = _call(CallOpts.ont, fa_fn, bam_fn)
    res = evaluate_f1(body, truth, beg, end, ref4)
    # identical gates to the first model's test
    assert res["snv"]["f1"] >= 0.92, res["snv"]
    assert res["indel"]["f1"] >= 0.85, res["indel"]
    assert res["sv"]["recall"] >= 0.5, res["sv"]
    assert res["snv"]["precision"] >= 0.98, res["snv"]
