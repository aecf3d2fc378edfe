"""star_msa hardening: small-case consensus oracles, 2-cluster bipartition
properties, and explicit partial-cover (left/right-only) drives.

The abPOA output contract under test: n_cons in {1,2}, per-cluster read
sets, per-read MSA rows over shared columns, per-cluster consensus
(/root/reference/src/align.c:762-943)."""

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.msa import (BOTH_COVER, GAP, LEFT_COVER, NOCOV,
                                    RIGHT_COVER, star_msa, _bipartition)
from longcalld_tpu.ops.affine_align import align_affine2p


def _drive(gen):
    """Synchronous coroutine driver: answer alignment requests with the
    exact host aligner."""
    send = None
    while True:
        try:
            pairs, left_align = gen.send(send)
        except StopIteration as e:
            return e.value
        flags = (left_align if isinstance(left_align, (list, tuple))
                 else [left_align] * len(pairs))
        send = [align_affine2p(t, q, left_align=f)
                for (t, q), f in zip(pairs, flags)]


def _msa(opt, seqs, covers, max_n_cons=1, **kw):
    return _drive(star_msa(opt, [np.asarray(s, dtype=np.uint8)
                                 for s in seqs],
                           list(covers), max_n_cons, **kw))


@pytest.fixture
def opt():
    return CallOpts.hifi()


def test_identical_reads_consensus_is_read(opt):
    rng = np.random.default_rng(0)
    base = rng.integers(0, 4, 150).astype(np.uint8)
    res = _msa(opt, [base] * 6, [BOTH_COVER] * 6)
    assert res.n_cons == 1
    assert np.array_equal(res.cons_seqs[0], base)
    assert res.included.all()
    # every row equals the backbone row (no gap/ins columns introduced)
    assert res.msa_rows.shape == (6, 150)
    assert (res.msa_rows == base[None, :]).all()


def test_majority_snp_and_indel_consensus(opt):
    """Planted SNP/INS/DEL carried by the majority must appear in the
    consensus; minority noise must not."""
    rng = np.random.default_rng(1)
    base = rng.integers(0, 4, 200).astype(np.uint8)
    snp = base.copy()
    snp[50] = (snp[50] + 1) % 4
    with_ins = np.concatenate([snp[:120], [0, 1, 2], snp[120:]])
    with_del = np.concatenate([snp[:160], snp[163:]])
    majority = np.concatenate([snp[:120], [0, 1, 2], snp[120:160],
                               snp[163:]])
    # backbone = raw base; 5 of 7 reads carry SNP+INS+DEL
    seqs = [base] + [majority] * 5 + [base]
    res = _msa(opt, seqs, [BOTH_COVER] * 7)
    assert res.n_cons == 1
    expected = np.concatenate([snp[:120], [0, 1, 2], snp[120:160],
                               snp[163:]])
    assert np.array_equal(res.cons_seqs[0], expected)
    del with_ins, with_del


def test_consensus_tie_prefers_smaller_symbol(opt):
    """Documented tie rule: equal counts -> smaller nt4 symbol wins."""
    base = np.array([3, 3, 3, 0, 3, 3, 3, 3, 3, 3] * 10, dtype=np.uint8)
    alt = base.copy()
    alt[43] = 1  # C vs base A at one position
    res = _msa(opt, [base, base, alt, alt], [BOTH_COVER] * 4)
    assert res.n_cons == 1
    # 2 reads say A(0), 2 say C(1) -> 0 wins
    assert res.cons_seqs[0][43] == min(int(base[43]), 1)


def test_consensus_truth_recovery_fuzz(opt):
    """Independent-oracle fuzz: 4 error-free reads always outvote 2 noisy
    ones at every MSA column, so the star consensus must reconstruct the
    generating sequence EXACTLY — across random substitutions, multi-base
    indels, and partial (left/right-cover) noisy reads.  This is the
    brute-force-checkable contract the abPOA replacement must satisfy
    (msa_abpoa + abpoa_msa consensus, /root/reference/src/align.c:762-943)."""
    rng = np.random.default_rng(11)
    for trial in range(40):
        L = int(rng.integers(60, 160))
        truth = rng.integers(0, 4, L).astype(np.uint8)
        seqs = [truth.copy() for _ in range(4)]
        covers = [BOTH_COVER] * 4
        for k in range(2):
            mode = int(rng.integers(0, 3))
            if mode == 1:
                arr = truth[:int(L * 0.7)].copy().tolist()
                c = LEFT_COVER
            elif mode == 2:
                arr = truth[int(L * 0.3):].copy().tolist()
                c = RIGHT_COVER
            else:
                arr = truth.copy().tolist()
                c = BOTH_COVER
            for _ in range(int(rng.integers(1, 4))):
                op = int(rng.integers(0, 3))
                pos = int(rng.integers(5, len(arr) - 5))
                if op == 0:
                    arr[pos] = int((arr[pos] + 1 + rng.integers(3)) % 4)
                elif op == 1:
                    arr[pos:pos] = [int(v) for v in
                                    rng.integers(0, 4, int(rng.integers(1, 6)))]
                else:
                    del arr[pos:pos + int(rng.integers(1, 6))]
            seqs.append(np.array(arr, dtype=np.uint8))
            covers.append(c)
        res = _msa(opt, seqs, covers)
        assert res is not None and res.n_cons == 1, trial
        assert np.array_equal(res.cons_seqs[0], truth), trial


def test_left_and_right_cover_partial_reads(opt):
    """Reads covering only one side must be anchored on that side, fill
    only their span, and still vote into the consensus there
    (cal_wfa_partial_aln_beg_end, align.c:667-745)."""
    rng = np.random.default_rng(2)
    base = rng.integers(0, 4, 300).astype(np.uint8)
    left_read = base[:180].copy()
    left_read[60] = (left_read[60] + 1) % 4
    right_read = base[120:].copy()
    right_read[200 - 120] = (right_read[200 - 120] + 1) % 4
    seqs = [base, left_read, right_read]
    res = _msa(opt, seqs, [BOTH_COVER, LEFT_COVER, RIGHT_COVER])
    assert res is not None and res.included.all()
    rows = res.msa_rows
    # left read: covered through ~col 180, NOCOV beyond; right read mirror
    assert rows[1, 0] != NOCOV and rows[1, -1] == NOCOV
    assert rows[2, 0] == NOCOV and rows[2, -1] != NOCOV
    # spans meet in the middle: every column covered by >= 1 non-backbone
    covered = (rows[1:] != NOCOV).any(axis=0)
    assert covered.all()
    # consensus equals the backbone (each partial mutation is outvoted by
    # backbone + the other read inside the 120..180 overlap; outside the
    # overlap the single covering read agrees with the backbone except at
    # its mutation, where a 1-1 tie resolves by symbol order)
    n_diff = int((res.cons_rows[0] != base).sum())
    assert n_diff <= 2


def test_partial_read_too_short_overlap_dropped(opt):
    """A 'left-cover' read that shares no real overlap with the backbone
    must be excluded rather than force-aligned."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 4, 250).astype(np.uint8)
    junk = rng.integers(0, 4, 200).astype(np.uint8)  # unrelated sequence
    res = _msa(opt, [base, junk], [BOTH_COVER, LEFT_COVER])
    assert res is not None
    assert bool(res.included[0])
    # junk read either dropped by the xgaps screen, or included with a
    # garbage alignment — the screen must drop it
    assert not bool(res.included[1])


def test_bipartition_recovers_two_haplotypes(opt):
    """Diploid signal: reads drawn from two haplotypes differing at 4
    columns split into the generating groups."""
    rng = np.random.default_rng(4)
    base = rng.integers(0, 4, 240).astype(np.uint8)
    h1 = base.copy()
    h2 = base.copy()
    for p in (30, 90, 150, 210):
        h2[p] = (h2[p] + 1) % 4
    labels = np.array([0, 1] * 6)
    seqs = [h1 if l == 0 else h2 for l in labels]
    res = _msa(opt, seqs, [BOTH_COVER] * len(seqs), max_n_cons=2,
               min_freq=0.25)
    assert res.n_cons == 2
    got = np.zeros(len(seqs), dtype=int)
    got[res.clu_read_idx[1]] = 1
    # clusters match labels up to swap
    assert (got == labels).all() or (got == 1 - labels).all()
    cons = sorted(res.cons_seqs, key=lambda s: s.tobytes())
    want = sorted([h1, h2], key=lambda s: s.tobytes())
    assert np.array_equal(cons[0], want[0])
    assert np.array_equal(cons[1], want[1])


def test_two_cluster_noisy_truth_recovery_fuzz(opt):
    """Hap-aware deep-simulation oracle: two haplotypes (SNPs + one 6 bp
    indel apart), 8 noisy reads each (random subs/small indels), 2-cluster
    MSA must split the reads into the generating groups AND reconstruct
    BOTH haplotype sequences exactly (the ONT hap-aware consensus path,
    align.c:853-943)."""
    rng = np.random.default_rng(12)
    for trial in range(12):
        L = int(rng.integers(100, 180))
        h1 = rng.integers(0, 4, L).astype(np.uint8)
        h2 = h1.copy()
        for p in range(20, L - 20, 30):
            h2[p] = (h2[p] + 1) % 4
        mid = L // 2
        h2 = np.concatenate([h2[:mid],
                             rng.integers(0, 4, 6).astype(np.uint8),
                             h2[mid:]])
        labels = np.array([0, 1] * 8)
        seqs = []
        for lab in labels:
            arr = (h1 if lab == 0 else h2).copy().tolist()
            for _ in range(int(rng.integers(0, 3))):
                op = int(rng.integers(0, 3))
                pos = int(rng.integers(5, len(arr) - 5))
                if op == 0:
                    arr[pos] = int((arr[pos] + 1 + rng.integers(3)) % 4)
                elif op == 1:
                    arr[pos:pos] = [int(v) for v in rng.integers(0, 4, 2)]
                else:
                    del arr[pos:pos + 2]
            seqs.append(np.array(arr, dtype=np.uint8))
        res = _msa(opt, seqs, [BOTH_COVER] * len(seqs), max_n_cons=2,
                   min_freq=0.25)
        assert res is not None and res.n_cons == 2, trial
        got = np.zeros(len(seqs), dtype=int)
        got[res.clu_read_idx[1]] = 1
        # a noisy read whose random errors hit informative columns may
        # legitimately land in the other cluster (true of abPOA as well);
        # at most one stray is tolerated — consensus exactness is not
        n_stray = min(int((got != labels).sum()),
                      int((got != 1 - labels).sum()))
        assert n_stray <= 1, trial
        cons = sorted(res.cons_seqs, key=lambda s: s.tobytes())
        want = sorted([h1, h2], key=lambda s: s.tobytes())
        assert np.array_equal(cons[0], want[0]), trial
        assert np.array_equal(cons[1], want[1]), trial


def test_bipartition_none_on_homozygous_data():
    """No informative columns -> no split."""
    rng = np.random.default_rng(5)
    rows = np.tile(rng.integers(0, 4, 80).astype(np.uint8), (10, 1))
    assert _bipartition(rows, 0.25) is None


def test_bipartition_min_cluster_size():
    """A 1-read minority never forms a cluster (min side >= max(2,
    min_freq*n))."""
    rng = np.random.default_rng(6)
    base = rng.integers(0, 4, 60).astype(np.uint8)
    rows = np.tile(base, (8, 1))
    rows[0, 10] = (rows[0, 10] + 1) % 4
    rows[0, 40] = (rows[0, 40] + 1) % 4
    assert _bipartition(rows, 0.2) is None


def test_bipartition_fuzz_planted(monkeypatch):
    """Randomized planted bipartitions with per-read noise are recovered
    whenever each informative column stays clean in >= 90% of reads."""
    rng = np.random.default_rng(7)
    for trial in range(25):
        n = int(rng.integers(8, 24))
        L = int(rng.integers(60, 160))
        base = rng.integers(0, 4, L).astype(np.uint8)
        h2 = base.copy()
        k = int(rng.integers(3, 7))
        diff_cols = rng.choice(L, size=k, replace=False)
        for p in diff_cols:
            h2[p] = (h2[p] + 1 + rng.integers(0, 3)) % 4
        labels = (rng.random(n) < 0.5).astype(int)
        if labels.sum() < 3 or (1 - labels).sum() < 3:
            continue
        rows = np.stack([base if l == 0 else h2 for l in labels]).copy()
        # sparse noise away from the informative columns
        noise_cols = np.setdiff1d(np.arange(L), diff_cols)
        for i in range(n):
            for p in rng.choice(noise_cols, size=2, replace=False):
                if rng.random() < 0.3:
                    rows[i, p] = rng.integers(0, 4)
        got = _bipartition(rows, 0.2)
        assert got is not None, trial
        a = np.zeros(n, dtype=bool)
        a[np.nonzero(got[1])[0]] = True
        lab = labels.astype(bool)
        assert (a == lab).all() or (a == ~lab).all(), trial


def test_edit_xgaps_brute_force():
    """edit_xgaps_nw == brute-force min (mismatches + gap opens) over all
    optimal edit paths... verified against an exhaustive unit-cost DP that
    tracks xgaps along *an* optimal-distance path the same way edlib does
    (greedy diagonal-first traceback)."""
    from longcalld_tpu.core.align_screen import (edit_distance_nw,
                                                 edit_xgaps_nw)
    rng = np.random.default_rng(9)

    def brute(t, q):
        # O(nm) reference DP with explicit per-cell traceback
        n, m = len(t), len(q)
        D = np.zeros((m + 1, n + 1), dtype=int)
        D[0] = np.arange(n + 1)
        D[:, 0] = np.arange(m + 1)
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                D[i, j] = min(D[i - 1, j - 1] + (t[j - 1] != q[i - 1]),
                              D[i - 1, j] + 1, D[i, j - 1] + 1)
        i, j, mm, gaps, last = m, n, 0, 0, 0
        while i > 0 or j > 0:
            if (i > 0 and j > 0
                    and D[i - 1, j - 1] + (t[j - 1] != q[i - 1]) == D[i, j]):
                mm += int(t[j - 1] != q[i - 1])
                i, j, last = i - 1, j - 1, 0
            elif i > 0 and D[i - 1, j] + 1 == D[i, j]:
                gaps += 0 if last == 1 else 1
                i, last = i - 1, 1
            else:
                gaps += 0 if last == 2 else 1
                j, last = j - 1, 2
        return mm + gaps

    for k in range(60):
        n = int(rng.integers(0, 25))
        m = int(rng.integers(0, 25))
        t = rng.integers(0, 4, n).astype(np.uint8)
        q = rng.integers(0, 4, m).astype(np.uint8)
        assert edit_xgaps_nw(t, q) == brute(t, q), (k, t, q)
        # sanity: xgaps <= edit distance (each counted event costs >= 1)
        assert edit_xgaps_nw(t, q) <= edit_distance_nw(t, q) + 1


def test_sampling_mode_drops_divergent_full_reads(opt):
    """sampling=True screens full-cover reads at 10% xgaps
    (align.c:774-779 sampling screen)."""
    rng = np.random.default_rng(8)
    base = rng.integers(0, 4, 200).astype(np.uint8)
    noisy = base.copy()
    idx = rng.choice(200, size=50, replace=False)
    noisy[idx] = (noisy[idx] + 1 + rng.integers(0, 3, 50)) % 4  # 25% diverged
    res = _msa(opt, [base, base, noisy], [BOTH_COVER] * 3, sampling=True)
    assert bool(res.included[1])
    assert not bool(res.included[2])
