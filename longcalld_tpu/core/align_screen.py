"""Cheap edit-distance screens (host reference implementations).

Covers the reference's edlib uses (/root/reference/src/align.c:164-275):
global (NW) and infix (HW) edit distance with equal-base counting, plus the
cyclic VNTR fuzzy sequence comparator (vntr_fuzzy_comp_seq,
/root/reference/src/collect_var.c:120-150).

The row-wise DP uses the prefix-min trick so every row is one numpy pass;
the batched device version lives in longcalld_tpu.ops.edit.
"""

from __future__ import annotations

import numpy as np


def edit_distance_nw(target: np.ndarray, query: np.ndarray) -> int:
    """Global (NW) edit distance."""
    t = np.asarray(target, dtype=np.int16)
    q = np.asarray(query, dtype=np.int16)
    n = len(t)
    if n == 0:
        return len(q)
    prev = np.arange(n + 1, dtype=np.int32)
    pos = np.arange(n + 1, dtype=np.int32)
    for i, qb in enumerate(q, start=1):
        sub = prev[:-1] + (t != qb)
        cand = np.minimum(np.concatenate([[i], sub]),
                          np.concatenate([[i], prev[1:] + 1]))
        cand[0] = i
        # left-dependency via prefix-min of (cand - j) + j
        row = np.minimum.accumulate(cand - pos) + pos
        prev = row
    return int(prev[-1])


def edit_distance_hw(target: np.ndarray, query: np.ndarray) -> int:
    """Infix (HW) edit distance: query aligned inside target, free target
    ends."""
    t = np.asarray(target, dtype=np.int16)
    q = np.asarray(query, dtype=np.int16)
    n = len(t)
    if n == 0:
        return len(q)
    prev = np.zeros(n + 1, dtype=np.int32)
    pos = np.arange(n + 1, dtype=np.int32)
    for i, qb in enumerate(q, start=1):
        sub = prev[:-1] + (t != qb)
        cand = np.minimum(np.concatenate([[i], sub]),
                          np.concatenate([[i], prev[1:] + 1]))
        cand[0] = i
        row = np.minimum.accumulate(cand - pos) + pos
        prev = row
    return int(prev.min())


def infix_n_eq(target: np.ndarray, query: np.ndarray) -> int:
    """#equal bases on the optimal infix path, computed as qlen - dist (a
    path with dist edits matches at least qlen-dist query bases; edlib's
    reported count coincides for minimal paths)."""
    d = edit_distance_hw(target, query)
    return max(0, len(query) - d)


def vntr_fuzzy_comp_seq(seq1: np.ndarray, seq2: np.ndarray) -> int:
    """Cyclic-rotation fuzzy match: double the longer sequence, infix-align
    the shorter; equal if >=80% of the shorter matches.  Returns 0 on match,
    1 otherwise (vntr_fuzzy_comp_seq, collect_var.c:120-150)."""
    if len(seq1) > len(seq2):
        long_seq, short_seq = seq1, seq2
    else:
        long_seq, short_seq = seq2, seq1
    doubled = np.concatenate([long_seq, long_seq])
    n_eq = infix_n_eq(doubled, short_seq)
    return 0 if n_eq >= len(short_seq) * 0.8 else 1
