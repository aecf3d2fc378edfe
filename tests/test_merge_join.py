"""_merge_join_rows: the vectorized sorted-merge fast path must equal the
comparator loop on every shape it claims (strictly increasing 48-byte
keys, exact-match semantics with old winning), including empty sides,
all-dup, and interleaved runs."""

import numpy as np
import pytest

from longcalld_tpu.core.consensus import _merge_join_rows


def _keys(rng, n, pool):
    ks = sorted(pool[i] for i in rng.choice(len(pool), n, replace=False))
    return ks


@pytest.mark.parametrize("seed", range(20))
def test_fast_path_equals_loop(seed):
    rng = np.random.default_rng(seed)
    # shared key pool so cross-list duplicates are common
    pool = sorted({bytes(rng.integers(0, 4, 48).astype(np.uint8))
                   for _ in range(60)})
    n_old = int(rng.integers(0, len(pool)))
    n_new = int(rng.integers(0, len(pool)))
    okb = _keys(rng, n_old, pool)
    nkb = _keys(rng, n_new, pool)

    def comp(i, j):
        return -1 if okb[i] < nkb[j] else (1 if okb[i] > nkb[j] else 0)

    slow = _merge_join_rows(okb, nkb, comp, fast_ok=False)
    fast = _merge_join_rows(okb, nkb, comp, fast_ok=True)
    assert np.array_equal(slow[0], fast[0])
    assert np.array_equal(slow[1], fast[1])
    assert slow[2] == fast[2]


def test_fast_path_declines_non_strict():
    """Non-strictly-increasing keys must fall back to the loop (the
    vectorized form assumes uniqueness within each list)."""
    k = b"\x01" * 48
    okb = [k, k]
    nkb = [k]
    calls = []

    def comp(i, j):
        calls.append((i, j))
        return -1 if okb[i] < nkb[j] else (1 if okb[i] > nkb[j] else 0)

    map_old, map_new, rows = _merge_join_rows(okb, nkb, comp, fast_ok=True)
    assert calls, "duplicate keys must take the comparator loop"
    assert len(rows) == 2 and map_new[0] == -1
