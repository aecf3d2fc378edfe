import numpy as np

from longcalld_tpu.utils.intervals import IntervalSet
from longcalld_tpu.utils.sdust import sdust


def test_overlap_queries():
    s = IntervalSet()
    s.add(10, 20, 1)
    s.add(15, 30, 2)
    s.add(50, 60, 3)
    assert len(s.overlap_indices(12, 16)) == 2
    assert len(s.overlap_indices(30, 50)) == 0
    assert s.any_overlap(59, 100)
    assert not s.any_overlap(60, 100)
    assert s.contained_in_any(16, 20)
    assert not s.contained_in_any(16, 35)
    pts = np.array([9, 10, 19, 20, 29, 30, 55])
    assert s.overlap_mask_points(pts).tolist() == [
        False, True, True, True, True, False, True]
    m = s.overlap_mask_ranges(np.array([0, 25, 40]), np.array([5, 40, 49]))
    assert m.tolist() == [False, True, False]


def test_merge_fixed_window():
    s = IntervalSet.from_arrays([0, 10, 30], [5, 20, 40])
    m = s.merge(0)
    assert len(m) == 3
    m = s.merge(5)
    assert len(m) == 2
    assert (m.starts == [0, 30]).all()


def test_merge_dynamic_label_window():
    # dynamic window = min(label_i, label_j), to fixpoint (cr_merge semantics)
    s = IntervalSet.from_arrays([0, 100, 300], [10, 110, 310],
                                [200, 50, 500])
    m = s.merge(-1)
    # 0-10 (lab 200) and 100-110 (lab 50): gap 90 <= min(200,50)=50? no.
    # wait: merged_end + win >= next_start -> 10 + 50 >= 100 false -> separate
    assert len(m) == 3
    s2 = IntervalSet.from_arrays([0, 100, 300], [10, 110, 310],
                                 [200, 150, 500])
    m2 = s2.merge(-1)
    # 10 + min(200,150)=150 >= 100 -> merge into [0,110] lab 200;
    # then 110 + min(200,500)=200 >= 300 -> merge again at fixpoint
    assert len(m2) == 1
    assert m2.starts[0] == 0 and m2.ends[0] == 310 and m2.labels[0] == 500


def test_total_length():
    s = IntervalSet.from_arrays([9, 50], [20, 60])
    # reference counts end-start+1 per stored interval
    assert s.total_length() == (20 - 9 + 1) + (60 - 50 + 1)


def test_sdust_basic():
    # poly-A is maximally low-complexity
    seq = np.array([0] * 50, dtype=np.uint8)
    regs = sdust(seq, 5, 20)
    assert len(regs) == 1
    s, e = regs[0]
    assert s == 0 and e == 50
    # random-ish high-complexity sequence: nothing masked
    rng = np.random.default_rng(0)
    seq2 = rng.integers(0, 4, size=500).astype(np.uint8)
    regs2 = sdust(seq2, 5, 20)
    total = sum(e - s for s, e in regs2)
    assert total < 100
    # N breaks sequences
    seq3 = np.array([0] * 30 + [4] + [1] * 30, dtype=np.uint8)
    regs3 = sdust(seq3, 5, 20)
    assert len(regs3) == 2


def test_sdust_native_matches_python_fuzz():
    """C fast path == Python oracle on randomized sequences (repeats + Ns),
    across parameterisations."""
    from longcalld_tpu.utils.sdust import _sdust_core, sdust_native
    rng = np.random.default_rng(7)
    for k in range(120):
        n = int(rng.integers(3, 600))
        seq = rng.integers(0, 4, n).astype(np.uint8)
        if k % 3 == 1:  # low-complexity stretches
            for _ in range(int(rng.integers(1, 4))):
                s = int(rng.integers(0, n))
                L = int(rng.integers(5, 60))
                unit = rng.integers(0, 4, int(rng.integers(1, 4)))
                rep = np.tile(unit, L)[:max(0, min(L, n - s))]
                seq[s:s + len(rep)] = rep
        if k % 4 == 2:  # N breaks
            seq[rng.integers(0, n, max(1, n // 30))] = 4
        T = int(rng.choice([5, 10, 20]))
        W = int(rng.choice([20, 64]))
        got = sdust_native(seq, T, W)
        want = np.asarray(_sdust_core(seq, T, W), dtype=np.int64)
        assert np.array_equal(got, want.reshape(-1, 2)), (k, T, W)
