"""Affine-2p aligner: optimal score vs brute-force DP, alignment-string
consistency, left-gap placement convention."""

import numpy as np
import pytest

from longcalld_tpu.ops.affine_align import AlnResult, align_affine2p


def brute_force_score(p, t, x=6, o1=6, e1=2, o2=24, e2=1):
    """O(nm(n+m)) reference: explicit gap-length minimization."""
    n, m = len(p), len(t)
    INF = 1 << 30

    def gap(l):
        return min(o1 + e1 * l, o2 + e2 * l) if l else INF

    dp = [[INF] * (m + 1) for _ in range(n + 1)]
    dp[0][0] = 0
    for i in range(n + 1):
        for j in range(m + 1):
            if i == 0 and j == 0:
                continue
            best = INF
            if i > 0 and j > 0:
                best = dp[i - 1][j - 1] + (0 if p[i - 1] == t[j - 1] else x)
            for g in range(1, j + 1):  # text gap ending at j
                best = min(best, dp[i][j - g] + gap(g))
            for g in range(1, i + 1):  # pattern gap ending at i
                best = min(best, dp[i - g][j] + gap(g))
            dp[i][j] = best
    return dp[n][m]


def check_consistency(p, t, res: AlnResult):
    pa, ta = res.pattern_alg, res.text_alg
    assert len(pa) == len(ta)
    assert not ((pa == 5) & (ta == 5)).any()
    assert (pa[pa != 5] == p).all()
    assert (ta[ta != 5] == t).all()
    # cigar consumes full lengths
    cig = res.cigar
    p_len = int(cig[np.isin(cig[:, 0], (7, 8, 2)), 1].sum())
    t_len = int(cig[np.isin(cig[:, 0], (7, 8, 1)), 1].sum())
    assert p_len == len(p) and t_len == len(t)


@pytest.mark.parametrize("seed", range(8))
def test_optimal_score_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 14))
    m = int(rng.integers(1, 14))
    p = rng.integers(0, 4, n).astype(np.uint8)
    t = rng.integers(0, 4, m).astype(np.uint8)
    res = align_affine2p(p, t, left_align=False)
    assert res.score == brute_force_score(list(p), list(t))
    check_consistency(p, t, res)
    res_l = align_affine2p(p, t, left_align=True)
    assert res_l.score == res.score
    check_consistency(p, t, res_l)


def test_mutated_long_sequence():
    rng = np.random.default_rng(42)
    p = rng.integers(0, 4, 2000).astype(np.uint8)
    t = np.concatenate([p[:800], rng.integers(0, 4, 50).astype(np.uint8),
                        p[800:]])  # 50bp insertion
    t = t.copy()
    t[100] = (t[100] + 1) % 4  # one SNP
    res = align_affine2p(p, t)
    check_consistency(p, t, res)
    # expect: one X, one 50bp I, rest =
    ins = res.cigar[res.cigar[:, 0] == 1]
    assert len(ins) == 1 and ins[0, 1] == 50
    assert res.cigar[res.cigar[:, 0] == 8][:, 1].sum() == 1
    # cost: mismatch 6 + 2-piece gap min(6+2*50, 24+1*50) = 74 -> total 80
    assert res.score == 6 + min(6 + 2 * 50, 24 + 50)


def test_left_gap_placement():
    # pattern AAAA vs text AAAAA: the extra A is placed LEFT under
    # left_align (reference convention via input reversal, align.c:410-414)
    p = np.array([0, 0, 0, 0], dtype=np.uint8)
    t = np.array([0, 0, 0, 0, 0], dtype=np.uint8)
    res = align_affine2p(p, t, left_align=True)
    assert res.cigar[0, 0] == 1  # leading insertion
    res_r = align_affine2p(p, t, left_align=False)
    assert res_r.cigar[-1, 0] == 1  # trailing insertion


def test_empty_inputs():
    p = np.array([0, 1, 2], dtype=np.uint8)
    empty = np.zeros(0, dtype=np.uint8)
    r1 = align_affine2p(p, empty)
    assert (r1.cigar == [[2, 3]]).all()
    r2 = align_affine2p(empty, p)
    assert (r2.cigar == [[1, 3]]).all()
    r3 = align_affine2p(empty, empty)
    assert len(r3.cigar) == 0


@pytest.mark.parametrize("seed", [0, 1])
def test_align_many_matches_single(seed):
    """Batched threaded C entry == per-pair align_affine2p on every field,
    including empty sides, mixed left_align flags, and banded-size pairs."""
    from longcalld_tpu.ops.affine_align import align_affine2p_many
    rng = np.random.default_rng(seed)
    pairs, flags = [], []
    for i in range(40):
        n = int(rng.integers(0, 400))
        p = rng.integers(0, 4, n).astype(np.uint8)
        t = p.copy()
        for _ in range(int(rng.integers(0, 5))):
            j = int(rng.integers(0, max(1, len(t))))
            if rng.random() < 0.5 and len(t) > 1:
                t = np.delete(t, j)
            else:
                t = np.insert(t, j, rng.integers(0, 4))
        pairs.append((p, t))
        flags.append(bool(rng.integers(0, 2)))
    # one pair large enough for the banded path (> 2^16 cells)
    big = rng.integers(0, 4, 600).astype(np.uint8)
    pairs.append((big, np.concatenate([big[:300], big[290:]])))
    flags.append(True)
    out = align_affine2p_many(pairs, flags, 6, 6, 2, 24, 1, n_threads=4)
    assert out is not None
    for (p, t), f, r in zip(pairs, flags, out):
        ref = align_affine2p(p, t, left_align=f)
        assert r.score == ref.score
        assert np.array_equal(r.cigar, ref.cigar)
        assert np.array_equal(r.pattern_alg, ref.pattern_alg)
        assert np.array_equal(r.text_alg, ref.text_alg)


def test_c_edit_distance_matches_numpy_fuzz():
    """native edit_distance (NW + HW) == the numpy row DP."""
    import numpy as np
    from longcalld_tpu.core import align_screen as a
    if a._edit_native() is None:
        import pytest
        pytest.skip("native edit_distance unavailable")
    rng = np.random.default_rng(0)
    for k in range(300):
        n = int(rng.integers(0, 60))
        m = int(rng.integers(1, 60))
        t = rng.integers(0, 4, n).astype(np.uint8)
        q = rng.integers(0, 4, m).astype(np.uint8)
        for fn in (a.edit_distance_nw, a.edit_distance_hw):
            got = fn(t, q)
            a._EDIT = False  # force the numpy fallback
            try:
                want = fn(t, q)
            finally:
                a._EDIT = None
            assert got == want, (k, fn.__name__, got, want)


@pytest.mark.parametrize("seed", range(4))
def test_guided_band_routing_score_optimal(seed):
    """The greedy-prepass guided-band routing (native
    affine2p_align_auto_full) must stay score-optimal vs the full DP on
    pairs spanning the escape regimes: clean, sub-heavy (score far past
    the old pad-24 escape threshold), indel-heavy, and identical."""
    from longcalld_tpu.ops.affine_align import _align_native
    rng = np.random.default_rng(seed)
    cases = []
    base = rng.integers(0, 4, 900).astype(np.uint8)
    cases.append((base, base.copy()))                       # identical
    t = base.copy()
    idx = rng.choice(900, 40, replace=False)                # score 240
    t[idx] = (t[idx] + rng.integers(1, 4, 40)) % 4
    cases.append((base, t))
    t2 = np.concatenate([base[:400],
                         rng.integers(0, 4, 60).astype(np.uint8),
                         base[380:]])                       # ins+dup
    cases.append((base, t2))
    for p, t in cases:
        res = _align_native(p, t, 6, 6, 2, 24, 1)
        assert res is not None
        check_consistency(p, t, res)
        # numpy full-DP oracle score (force the non-native tier)
        from longcalld_tpu.ops import affine_align as aa
        saved = aa._NATIVE
        aa._NATIVE = False
        try:
            ref = aa._align(p, t, 6, 6, 2, 24, 1)
        finally:
            aa._NATIVE = saved
        assert res.score == ref.score
        assert np.array_equal(res.cigar, ref.cigar)
        assert np.array_equal(res.pattern_alg, ref.pattern_alg)
