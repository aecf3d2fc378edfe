"""Parity: prefix-sum alignment-string queries vs the sequential walks.

The sequential implementations here are line-for-line ports of the reference
walks (is_match_aln_str collect_var.c:1960-1997, is_match_aln_str_del
:2000-2036, get_full_cover_from_ref_cons_aln_str :2107-2129) and serve as
oracles for the O(log L) versions in longcalld_tpu.core.consensus.
"""

import numpy as np
import pytest

from longcalld_tpu.core.alnstr import AlnStr
from longcalld_tpu.core.consensus import (GAP, _full_cover_del_via_ref,
                                          _is_cover_aln_str,
                                          _is_match_aln_str,
                                          _is_match_aln_str_del)


def slow_is_match(s, target_pos, length, sim):
    cur = -1
    n_eq = n_xid = 0
    cover_start = cover_end = 0
    start_pos = target_pos if target_pos >= 0 else 0
    end_pos = (target_pos + length - 1 if target_pos >= 0 else length - 1)
    t, q = s.target_aln, s.query_aln
    for i in range(s.aln_len):
        if t[i] != GAP:
            cur += 1
        if cur == target_pos + length:
            break
        if i < s.query_beg or i < s.target_beg:
            continue
        if i > s.query_end or i > s.target_end:
            break
        if cur == start_pos:
            cover_start = 1
        if cur == end_pos:
            cover_end = 1
        if cur >= target_pos:
            if q[i] == t[i]:
                n_eq += 1
            else:
                n_xid += 1
    full = 1 if (cover_start and cover_end) else 0
    if length >= 10:
        if n_eq >= length * sim:
            return 1, full
        return (0, full) if full else (-1, full)
    if n_eq == length and n_xid == 0:
        return 1, full
    return (0, full) if full else (-1, full)


def slow_is_match_del(s, left, right):
    cur = -1
    started = 0
    n_non_del = 0
    cover_start = cover_end = 0
    start_pos = left if left >= 0 else 0
    end_pos = right
    t, q = s.target_aln, s.query_aln
    for i in range(s.aln_len):
        if t[i] != GAP:
            cur += 1
        if cur > right:
            break
        if i < s.query_beg or i < s.target_beg:
            continue
        if i > s.query_end or i > s.target_end:
            break
        if cur == start_pos:
            cover_start = 1
        if cur == end_pos:
            cover_end = 1
        if left <= cur < right:
            if not started:
                started = 1
            elif q[i] != GAP:
                n_non_del += 1
    if cover_start and cover_end:
        return (1 if n_non_del == 0 else 0), 1
    return -1, 0


def slow_is_cover(s, target_pos, length):
    cur = -1
    cover_start = cover_end = 0
    start_pos = target_pos if target_pos >= 0 else 0
    end_pos = (target_pos + length - 1 if target_pos >= 0 else length - 1)
    t = s.target_aln
    for i in range(s.aln_len):
        if t[i] != GAP:
            cur += 1
        if i < s.query_beg or i < s.target_beg:
            continue
        if i > s.query_end or i > s.target_end:
            break
        if cur == start_pos:
            cover_start = 1
        if cur == end_pos:
            cover_end = 1
        if cover_start and cover_end:
            return 1
    return 0


def slow_full_cover_del_via_ref(cons_read, ref_cons, beg_in_ref, end_in_ref):
    cur_ref = cur_cons = -1
    beg_in_cons = end_in_cons = -1
    reach_end = 0
    t, q = ref_cons.target_aln, ref_cons.query_aln
    for i in range(ref_cons.aln_len):
        if t[i] != GAP:
            cur_ref += 1
        if q[i] != GAP:
            cur_cons += 1
        if i < ref_cons.query_beg or i < ref_cons.target_beg:
            continue
        if i > ref_cons.query_end or i > ref_cons.target_end:
            break
        if cur_ref == beg_in_ref and beg_in_cons == -1:
            beg_in_cons = cur_cons
        if cur_ref == end_in_ref:
            reach_end = 1
        if reach_end and q[i] != GAP:
            end_in_cons = cur_cons
            break
    return slow_is_cover(cons_read, beg_in_cons,
                         end_in_cons - beg_in_cons + 1)


def random_aln_str(rng, n):
    t = rng.integers(0, 6, n).astype(np.uint8)
    q = rng.integers(0, 6, n).astype(np.uint8)
    # boost match rate so n_eq paths both trigger
    m = rng.random(n) < 0.5
    q[m] = t[m]
    # avoid all-gap degenerate columns dominating
    beg = int(rng.integers(0, max(1, n // 4)))
    end = int(rng.integers(3 * n // 4, n))
    s = AlnStr(t, q, 0, end - 1, beg, end - 1)
    return s


@pytest.mark.parametrize("seed", range(5))
def test_match_and_cover_parity(seed):
    rng = np.random.default_rng(seed)
    for _ in range(40):
        n = int(rng.integers(1, 120))
        s = random_aln_str(rng, n)
        n_t = int((np.asarray(s.target_aln) != GAP).sum())
        for _ in range(25):
            tp = int(rng.integers(-3, n_t + 3))
            ln = int(rng.integers(1, 15))
            sim = 0.9
            assert _is_match_aln_str(s, tp, ln, sim) == \
                slow_is_match(s, tp, ln, sim), (n, tp, ln)
            assert _is_cover_aln_str(s, tp, ln) == \
                slow_is_cover(s, tp, ln), (n, tp, ln)
            left = int(rng.integers(-2, n_t + 2))
            right = int(rng.integers(left, n_t + 3))
            assert _is_match_aln_str_del(s, left, right) == \
                slow_is_match_del(s, left, right), (n, left, right)


@pytest.mark.parametrize("seed", range(3))
def test_full_cover_del_via_ref_parity(seed):
    rng = np.random.default_rng(100 + seed)
    for _ in range(40):
        n = int(rng.integers(2, 100))
        ref_cons = random_aln_str(rng, n)
        cons_read = random_aln_str(rng, int(rng.integers(2, 100)))
        n_t = int((np.asarray(ref_cons.target_aln) != GAP).sum())
        for _ in range(10):
            b = int(rng.integers(-2, n_t + 2))
            e = int(rng.integers(b, n_t + 3))
            assert (_full_cover_del_via_ref(cons_read, ref_cons, b, e)
                    == slow_full_cover_del_via_ref(cons_read, ref_cons, b, e)
                    ), (n, b, e)
