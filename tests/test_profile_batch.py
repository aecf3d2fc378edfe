"""Parity: batched consensus-profile updates vs the sequential oracles.

_update_profile_{one,two}_cons collapse the per-var alignment-string
queries into one prefix-sum batch per var type; the original per-var
walks stay as *_seq oracles.  Randomized alignment strings, var lists,
and cluster masks must produce identical coverage counters and profile
rows."""

import numpy as np
import pytest

from longcalld_tpu.core.alnstr import AlnStr
from longcalld_tpu.core.consensus import (NoisyProfile,
                                          _update_profile_one_cons,
                                          _update_profile_one_cons_seq,
                                          _update_profile_two_cons,
                                          _update_profile_two_cons_seq)
from longcalld_tpu.core.sites import make_cand_vars
from longcalld_tpu.io.bam import CDEL, CDIFF, CINS

GAP = 5


def _rand_aln(rng, n):
    """Random alignment-string pair with plausible gap structure."""
    t = rng.integers(0, 4, n).astype(np.uint8)
    q = t.copy()
    for _ in range(int(rng.integers(0, n // 6 + 1))):
        i = int(rng.integers(0, n))
        q[i] = int(rng.integers(0, 4))
    for _ in range(int(rng.integers(0, 4))):
        i = int(rng.integers(0, n))
        ln = int(rng.integers(1, 5))
        if rng.random() < 0.5:
            q[i:i + ln] = GAP
        else:
            t[i:i + ln] = GAP
    qb = int(rng.integers(0, max(1, n // 5)))
    qe = int(rng.integers(n - max(1, n // 5), n))
    tb = int(rng.integers(0, max(1, n // 5)))
    te = int(rng.integers(n - max(1, n // 5), n))
    return AlnStr(t, q, tb, te, qb, qe)


def _rand_cand(rng, reg_beg, span):
    rows = []
    pos = reg_beg + int(rng.integers(0, 6))
    while pos < reg_beg + span:
        t = int(rng.choice([CDIFF, CDIFF, CINS, CDEL]))
        if t == CDIFF:
            rl, al, alt = 1, 1, bytes([int(rng.integers(0, 4))])
        elif t == CINS:
            al = int(rng.integers(1, 6))
            rl, alt = 0, bytes(rng.integers(0, 4, al).tolist())
        else:
            rl = int(rng.integers(1, 6))
            al, alt = 0, b""
        rows.append((pos, t, rl, al, alt))
        pos += int(rng.integers(2, 10))
    return make_cand_vars(rows)


def _clone(cand):
    import copy
    c = copy.deepcopy(cand)
    return c


@pytest.mark.parametrize("seed", range(8))
def test_one_cons_batch_matches_seq(seed):
    rng = np.random.default_rng(seed)
    s = _rand_aln(rng, int(rng.integers(30, 120)))
    reg_beg = 1000
    cand = _rand_cand(rng, reg_beg, s.aln_len)
    c1, c2 = _clone(cand), _clone(cand)
    p1, p2 = NoisyProfile(1, len(cand)), NoisyProfile(1, len(cand))
    _update_profile_one_cons(s, reg_beg, c1, p1, 0)
    _update_profile_one_cons_seq(s, reg_beg, c2, p2, 0)
    np.testing.assert_array_equal(c1.total_cov, c2.total_cov)
    np.testing.assert_array_equal(c1.alle_covs, c2.alle_covs)
    np.testing.assert_array_equal(p1.alleles, p2.alleles)
    np.testing.assert_array_equal(p1.start, p2.start)
    np.testing.assert_array_equal(p1.end, p2.end)


@pytest.mark.parametrize("seed", range(8))
def test_one_cons_multiread_matches_per_read(seed):
    """The cross-read _AlnStrBatch path equals per-read updates."""
    from longcalld_tpu.core.consensus import _update_profile_one_cons_batch
    rng = np.random.default_rng(300 + seed)
    reg_beg = 1000
    R = int(rng.integers(1, 7))
    rows = [(r, _rand_aln(rng, int(rng.integers(30, 120))))
            for r in range(R)]
    span = min(s.aln_len for _, s in rows)
    cand = _rand_cand(rng, reg_beg, span)
    c1, c2 = _clone(cand), _clone(cand)
    p1, p2 = NoisyProfile(R, len(cand)), NoisyProfile(R, len(cand))
    _update_profile_one_cons_batch(rows, reg_beg, c1, p1)
    for rid, s in rows:
        _update_profile_one_cons(s, reg_beg, c2, p2, rid)
    np.testing.assert_array_equal(c1.total_cov, c2.total_cov)
    np.testing.assert_array_equal(c1.alle_covs, c2.alle_covs)
    np.testing.assert_array_equal(p1.alleles, p2.alleles)
    np.testing.assert_array_equal(p1.start, p2.start)
    np.testing.assert_array_equal(p1.end, p2.end)


@pytest.mark.parametrize("seed", range(8))
def test_two_cons_multiread_matches_per_read(seed):
    """The cross-read _AlnStrBatch path equals per-read updates."""
    from longcalld_tpu.core.consensus import _update_profile_two_cons_batch
    rng = np.random.default_rng(400 + seed)
    reg_beg = 1000
    R = int(rng.integers(1, 7))
    rows = [(r, _rand_aln(rng, int(rng.integers(30, 120))))
            for r in range(R)]
    ref_cons = _rand_aln(rng, int(rng.integers(30, 120)))
    span = min(s.aln_len for _, s in rows)
    cand = _rand_cand(rng, reg_beg, span)
    from_cons = rng.integers(1, 4, len(cand)).astype(np.int64)
    for clu_idx in (1, 2):
        c1, c2 = _clone(cand), _clone(cand)
        p1, p2 = NoisyProfile(R, len(cand)), NoisyProfile(R, len(cand))
        _update_profile_two_cons_batch(clu_idx, rows, ref_cons, reg_beg,
                                       c1, from_cons, p1)
        for rid, s in rows:
            _update_profile_two_cons(clu_idx, s, ref_cons, reg_beg, c2,
                                     from_cons, p2, rid)
        np.testing.assert_array_equal(c1.total_cov, c2.total_cov)
        np.testing.assert_array_equal(c1.alle_covs, c2.alle_covs)
        np.testing.assert_array_equal(p1.alleles, p2.alleles)
        np.testing.assert_array_equal(p1.start, p2.start)
        np.testing.assert_array_equal(p1.end, p2.end)


@pytest.mark.parametrize("seed", range(8))
def test_two_cons_batch_matches_seq(seed):
    rng = np.random.default_rng(100 + seed)
    s = _rand_aln(rng, int(rng.integers(30, 120)))
    ref_cons = _rand_aln(rng, int(rng.integers(30, 120)))
    reg_beg = 1000
    cand = _rand_cand(rng, reg_beg, s.aln_len)
    from_cons = rng.integers(1, 4, len(cand)).astype(np.int64)
    for clu_idx in (1, 2):
        c1, c2 = _clone(cand), _clone(cand)
        p1, p2 = NoisyProfile(1, len(cand)), NoisyProfile(1, len(cand))
        _update_profile_two_cons(clu_idx, s, ref_cons, reg_beg, c1,
                                 from_cons, p1, 0)
        _update_profile_two_cons_seq(clu_idx, s, ref_cons, reg_beg, c2,
                                     from_cons, p2, 0)
        np.testing.assert_array_equal(c1.total_cov, c2.total_cov)
        np.testing.assert_array_equal(c1.alle_covs, c2.alle_covs)
        np.testing.assert_array_equal(p1.alleles, p2.alleles)
        np.testing.assert_array_equal(p1.start, p2.start)
        np.testing.assert_array_equal(p1.end, p2.end)
