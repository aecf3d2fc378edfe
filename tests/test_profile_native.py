"""Native profile merge-join == Python oracle.

Wraps update_read_profile so every production call during a full run_call
on the real HG002 HiFi window runs BOTH the C join and the sequential
Python oracle and asserts identical allele rows, alt read positions, and
per-read spans — covering the initial profile pass and every noisy-wave
re-fill (consensus.py's update path) on real data.
"""

import io
import os

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core import profile
from longcalld_tpu.core.pipeline import run_call

REF = "/root/reference/test_data/chr11_2M.fa"
BAM = "/root/reference/test_data/HG002_chr11_hifi_test.bam"


@pytest.fixture
def native_lib():
    lib = profile._load_native()
    if not lib:
        pytest.skip("native profilejoin unavailable")
    return lib


def test_native_join_matches_oracle_on_real_window(monkeypatch, native_lib):
    if not os.path.exists(BAM):
        pytest.skip("test data missing")
    n_checked = {"n": 0, "native": 0}

    def checking(opt, chunk, read_i, digar, somatic_counts=True):
        has_som = len(chunk.cand_vars) and bool(
            (chunk.var_cate == profile.config.CAND_SOMATIC_VAR).any())
        al0 = chunk.alleles[read_i].copy()
        aq0 = chunk.alt_qi[read_i].copy()
        profile._update_read_profile_py(opt, chunk, read_i, digar,
                                        somatic_counts)
        al_py = chunk.alleles[read_i].copy()
        aq_py = chunk.alt_qi[read_i].copy()
        sv_py = int(chunk.read_start_var[read_i])
        ev_py = int(chunk.read_end_var[read_i])
        n_checked["n"] += 1
        if has_som or not len(chunk.cand_vars):
            return  # native path not eligible; oracle result stands
        chunk.alleles[read_i] = al0
        chunk.alt_qi[read_i] = aq0
        profile._update_read_profile_native(opt, chunk, read_i, digar,
                                            native_lib)
        n_checked["native"] += 1
        np.testing.assert_array_equal(chunk.alleles[read_i], al_py)
        np.testing.assert_array_equal(chunk.alt_qi[read_i], aq_py)
        assert int(chunk.read_start_var[read_i]) == sv_py
        assert int(chunk.read_end_var[read_i]) == ev_py

    monkeypatch.setattr(profile, "update_read_profile", checking)
    monkeypatch.setattr("longcalld_tpu.core.consensus.update_read_profile",
                        checking, raising=False)
    opt = CallOpts.hifi(ref_fa_fn=REF, in_bam_fns=[BAM])
    out = io.StringIO()
    n = run_call(opt, out, "t")
    assert n > 500
    assert n_checked["native"] > 300, n_checked


def test_vcf_identical_with_and_without_native(monkeypatch):
    if not os.path.exists(BAM):
        pytest.skip("test data missing")
    opt = CallOpts.hifi(ref_fa_fn=REF, in_bam_fns=[BAM],
                        regions=["chr11:1230000-1330000"])
    a = io.StringIO()
    run_call(opt, a, "t")
    monkeypatch.setattr("longcalld_tpu.core.sites._NATIVE", False)
    b = io.StringIO()
    run_call(opt, b, "t")
    assert a.getvalue() == b.getvalue()
