"""Vectorized splice_read_digar == the tuple-list oracle.

Wraps the production splice so every call during a full somatic run and a
--refine-aln run on the real HG002 window also runs the reference
transcription (_splice_read_digar_ref) and asserts identical digars —
covering all three cover classes (both / left / right) on real data.
"""

import io
import os

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core import refine
from longcalld_tpu.core.pipeline import run_call

REF = "/root/reference/test_data/chr11_2M.fa"
BAM = "/root/reference/test_data/HG002_chr11_hifi_test.bam"
TE = "/root/reference/anno/AluY_L1_SVA_cons_noPA.fa"


def _checking(stats):
    real = refine.splice_read_digar

    def check(opt, d, cover, reg_beg, reg_end, read_beg, read_end,
              t_aln, q_aln):
        got = real(opt, d, cover, reg_beg, reg_end, read_beg, read_end,
                   t_aln, q_aln)
        want = refine._splice_read_digar_ref(
            opt, d, cover, reg_beg, reg_end, read_beg, read_end,
            t_aln, q_aln)
        stats["n"] += 1
        if want is None or got is None:
            assert (got is None) == (want is None), cover
            return got
        stats["ok"] += 1
        assert got.beg == want.beg and got.end == want.end
        np.testing.assert_array_equal(got.pos, want.pos)
        np.testing.assert_array_equal(got.type, want.type)
        np.testing.assert_array_equal(got.len, want.len)
        np.testing.assert_array_equal(got.qi, want.qi)
        np.testing.assert_array_equal(got.low_qual, want.low_qual)
        return got

    return check


def _compose_oracle(opt, ref_cons, cons_read):
    """Pure sequential column walk (the pre-vectorization implementation)."""
    from longcalld_tpu.core import alnstr
    t_out, q_out = [], []
    alnstr._compose_cols(opt, ref_cons.target_aln, ref_cons.query_aln,
                         cons_read.target_aln, cons_read.query_aln,
                         t_out, q_out)
    t = (np.concatenate(t_out) if t_out else np.zeros(0, dtype=np.uint8))
    q = (np.concatenate(q_out) if q_out else np.zeros(0, dtype=np.uint8))
    return t, q


def _checking_compose(stats):
    from longcalld_tpu.core import alnstr
    real = alnstr.ref_read_aln_from_pair

    def check(opt, ref_cons, cons_read):
        got = real(opt, ref_cons, cons_read)
        t, q = _compose_oracle(opt, ref_cons, cons_read)
        stats["n"] += 1
        np.testing.assert_array_equal(got.target_aln, t)
        np.testing.assert_array_equal(got.query_aln, q)
        return got

    return check


@pytest.mark.parametrize("mode", ["somatic", "refine"])
def test_splice_matches_oracle_on_real_data(monkeypatch, mode, tmp_path):
    if not os.path.exists(BAM):
        pytest.skip("test data missing")
    stats = {"n": 0, "ok": 0}
    monkeypatch.setattr("longcalld_tpu.core.refine.splice_read_digar",
                        _checking(stats))
    from longcalld_tpu.core import consensus

    mstats = {"n": 0}
    real_make = consensus.make_cand_vars_from_aln

    def make_check(opt, chunk, reg_beg, ref_aln, cons_aln,
                   no_end_var=False):
        got = real_make(opt, chunk, reg_beg, ref_aln, cons_aln, no_end_var)
        want = consensus._make_cand_vars_from_aln_ref(
            opt, chunk, reg_beg, ref_aln, cons_aln, no_end_var)
        mstats["n"] += 1
        np.testing.assert_array_equal(got[0].pos, want[0].pos)
        np.testing.assert_array_equal(got[0].type, want[0].type)
        np.testing.assert_array_equal(got[0].ref_len, want[0].ref_len)
        np.testing.assert_array_equal(got[0].alt_len, want[0].alt_len)
        assert got[0].alt_seqs == want[0].alt_seqs
        np.testing.assert_array_equal(got[2], want[2])
        assert got[1] == want[1]
        return got

    monkeypatch.setattr(consensus, "make_cand_vars_from_aln", make_check)

    cstats = {"n": 0}
    compose_check = _checking_compose(cstats)
    monkeypatch.setattr("longcalld_tpu.core.alnstr.ref_read_aln_from_pair",
                        compose_check)
    # consensus binds the name at import time — patch that binding too
    monkeypatch.setattr(
        "longcalld_tpu.core.consensus.ref_read_aln_from_pair",
        compose_check)
    if mode == "somatic":
        opt = CallOpts.hifi(ref_fa_fn=REF, in_bam_fns=[BAM],
                            regions=["chr11:1230000-1330000"],
                            out_somatic=True, te_seq_fn=TE)
    else:
        opt = CallOpts.hifi(ref_fa_fn=REF, in_bam_fns=[BAM],
                            regions=["chr11:1230000-1330000"],
                            refine_bam=True,
                            out_bam_fn=str(tmp_path / "o.bam"))
    run_call(opt, io.StringIO(), "t")
    assert stats["n"] > 200, stats
    assert stats["ok"] > 100, stats
    assert cstats["n"] > 200, cstats
    # the miner only runs under -s; plain --refine-aln extracts once per
    # consensus, not per read
    assert mstats["n"] > (200 if mode == "somatic" else 20), mstats
