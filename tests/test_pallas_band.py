"""Bit-parity of the Pallas banded-DP kernel against the lax.scan
formulation it replaces (ops/wfa.py:_banded_dp).

Runs the kernel in interpret mode (tests force JAX_PLATFORMS=cpu), feeding
it batches built exactly the way BatchAligner._submit_batch does —
bucket-padded pattern matrices, pre-shifted Tband with sentinel 127, mixed
real/dummy pairs — and asserts the three outputs (traceback bit planes,
captured finals in PERM order, band-edge escape metric) are identical.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from longcalld_tpu.ops import wfa
from longcalld_tpu.ops.pallas_band import (backward_resolve_pallas,
                                           banded_dp_pallas, vmem_fits)

X, O1, E1, O2, E2 = 4, 4, 2, 24, 1


def _mutate(rng, seq, n_sub, n_indel):
    s = list(seq)
    for _ in range(n_sub):
        i = rng.integers(0, len(s))
        s[i] = rng.integers(0, 4)
    for _ in range(n_indel):
        i = rng.integers(0, max(1, len(s)))
        if rng.random() < 0.5 and len(s) > 2:
            del s[i:i + int(rng.integers(1, 4))]
        else:
            s[i:i] = list(rng.integers(0, 4, int(rng.integers(1, 4))))
    return np.array(s, dtype=np.uint8)


def _build(rng, n_pairs, B, Lp, include_empty=False):
    """Mirror BatchAligner._submit_batch's device-input construction."""
    pairs = []
    for _ in range(n_pairs):
        L = int(rng.integers(3, Lp))
        p = rng.integers(0, 4, L).astype(np.uint8)
        t = _mutate(rng, p, int(rng.integers(0, 4)), int(rng.integers(0, 3)))
        if abs(len(t) - len(p)) + 4 >= B:
            t = t[:len(p)]
        pairs.append((p, t))
    if include_empty:
        pairs[0] = (np.zeros(1, dtype=np.uint8), np.zeros(1, dtype=np.uint8))
    n = len(pairs)
    plens = np.array([len(p) for p, _ in pairs], dtype=np.int32)
    tlens = np.array([len(t) for _, t in pairs], dtype=np.int32)
    m_n = tlens - plens
    dlo = np.minimum(0, m_n) - (B - np.abs(m_n)) // 2
    P = np.full((n, Lp), 4, dtype=np.int8)
    Tband = np.full((n, Lp + B), 127, dtype=np.int8)
    for k, (p, t) in enumerate(pairs):
        P[k, :len(p)] = p
        off = -int(dlo[k])
        end = min(off + len(t), Lp + B)
        if end > off >= 0:
            Tband[k, off:end] = t[:end - off]
    return (jnp.asarray(P), jnp.asarray(Tband), jnp.asarray(plens),
            jnp.asarray(tlens), jnp.asarray(dlo))


def _run_both(P, Tband, plen, tlen, dlo, B, Lp):
    tbs_l, fin_l, edge_l = wfa._banded_dp(P, Tband, plen, tlen, dlo,
                                          B, Lp, X, O1, E1, O2, E2)
    tbs_p, fin_p, edge_p = banded_dp_pallas(P, Tband, plen, tlen, dlo,
                                            B, Lp, X, O1, E1, O2, E2,
                                            interpret=True)
    np.testing.assert_array_equal(np.asarray(fin_p), np.asarray(fin_l))
    np.testing.assert_array_equal(np.asarray(edge_p), np.asarray(edge_l))
    np.testing.assert_array_equal(np.asarray(tbs_p), np.asarray(tbs_l))

    # backward walk: packed op/n_ins stream + band position at row 0
    nins_l, ops_l, b0_l = wfa._backward_resolve(tbs_l, plen, tlen, dlo,
                                                fin_l, B, Lp)
    packed_l = (np.asarray(ops_l).astype(np.int32) << 14) | np.minimum(
        np.asarray(nins_l), (1 << 14) - 1)
    packed_p, b0_p = backward_resolve_pallas(tbs_l, plen, tlen, dlo, fin_l,
                                             B, Lp, interpret=True)
    np.testing.assert_array_equal(np.asarray(packed_p), packed_l)
    np.testing.assert_array_equal(np.asarray(b0_p), np.asarray(b0_l))


@pytest.mark.parametrize("seed,batch,B,Lp", [
    (0, 8, 128, 32),
    (1, 8, 128, 96),
    (2, 16, 256, 64),
])
def test_pallas_matches_lax(seed, batch, B, Lp):
    rng = np.random.default_rng(seed)
    _run_both(*_build(rng, batch, B, Lp), B, Lp)


def test_pallas_matches_lax_with_empty_pair():
    """plen==0 dummy pairs take the row-0 finals path (ops/wfa.py:163-170)."""
    rng = np.random.default_rng(7)
    _run_both(*_build(rng, 8, 128, 48, include_empty=True), 128, 48)


def test_vmem_fits_gate():
    assert vmem_fits(512, 256, 2048)
    assert vmem_fits(128, 1024, 2048)
    assert not vmem_fits(2048, 256, 2048)     # over the probed row cap
    assert not vmem_fits(512, 1024, 2048)     # tripped 16M scoped vmem
    assert not vmem_fits(12, 256, 2048)       # batch not sublane-aligned
