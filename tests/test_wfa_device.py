"""Device banded aligner vs the exact host oracle."""

import numpy as np
import pytest

from longcalld_tpu.ops.affine_align import align_affine2p
from longcalld_tpu.ops.wfa import BatchAligner


def _mutate(rng, seq, n_snp=3, ins=0, dele=0):
    t = seq.copy()
    for _ in range(n_snp):
        i = int(rng.integers(0, len(t)))
        t[i] = (t[i] + 1) % 4
    if ins:
        i = int(rng.integers(0, len(t)))
        t = np.concatenate([t[:i], rng.integers(0, 4, ins).astype(np.uint8),
                            t[i:]])
    if dele:
        i = int(rng.integers(0, max(1, len(t) - dele)))
        t = np.concatenate([t[:i], t[i + dele:]])
    return t


@pytest.fixture(scope="module")
def aligner():
    return BatchAligner(use_device=True)


def test_batch_matches_host_oracle(aligner):
    rng = np.random.default_rng(7)
    pairs = []
    for k in range(24):
        n = int(rng.integers(50, 400))
        p = rng.integers(0, 4, n).astype(np.uint8)
        t = _mutate(rng, p, n_snp=int(rng.integers(0, 6)),
                    ins=int(rng.integers(0, 40)),
                    dele=int(rng.integers(0, 40)))
        pairs.append((p, t))
    dev = aligner.align_many(pairs, left_align=True)
    for (p, t), r in zip(pairs, dev):
        host = align_affine2p(p, t, left_align=True)
        assert r.score == host.score, "suboptimal device score"
        # consistency of the alignment strings
        assert (r.pattern_alg[r.pattern_alg != 5] == p).all()
        assert (r.text_alg[r.text_alg != 5] == t).all()


def test_batch_identical_when_no_fallback(aligner):
    rng = np.random.default_rng(3)
    p = rng.integers(0, 4, 200).astype(np.uint8)
    t = _mutate(rng, p, n_snp=2, ins=5)
    before = aligner.n_fallback
    dev = aligner.align_many([(p, t)] * 3, left_align=False)
    assert aligner.n_fallback == before  # comfortably inside the band
    host = align_affine2p(p, t, left_align=False)
    for r in dev:
        assert r.score == host.score
        assert (r.cigar == host.cigar).all()


def test_empty_and_tiny(aligner):
    p = np.array([0, 1, 2, 3], dtype=np.uint8)
    e = np.zeros(0, dtype=np.uint8)
    res = aligner.align_many([(p, e), (e, p), (p, p)], left_align=True)
    assert (res[0].cigar == [[2, 4]]).all()
    assert (res[1].cigar == [[1, 4]]).all()
    assert (res[2].cigar == [[7, 4]]).all()


def test_huge_indel_band_fallback(aligner):
    # compensating INS+DEL far apart pushes the path off-band -> fallback
    rng = np.random.default_rng(11)
    p = rng.integers(0, 4, 600).astype(np.uint8)
    t = p.copy()
    t = np.concatenate([t[:100], rng.integers(0, 4, 300).astype(np.uint8),
                        t[100:300], t[500:]])  # +300 ins, -200 del
    res = aligner.align_many([(p, t)], left_align=True)[0]
    host = align_affine2p(p, t, left_align=True)
    assert res.score == host.score
