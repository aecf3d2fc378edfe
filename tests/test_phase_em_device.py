"""Device phase-EM kernel vs expected haplotype structure."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from longcalld_tpu.ops.phase_em import PhaseEmInputs, phase_em


def _window(rng, n_reads=40, n_vars=24, err=0.02):
    """Synthesize a phased window: half the reads hap1, half hap2."""
    truth = rng.integers(0, 2, n_vars)  # hap1 allele per var
    A = np.full((n_reads, n_vars), -1, dtype=np.int8)
    haps = np.array([1] * (n_reads // 2) + [2] * (n_reads - n_reads // 2))
    for r in range(n_reads):
        alle = truth if haps[r] == 1 else 1 - truth
        noise = rng.random(n_vars) < err
        A[r] = np.where(noise, 1 - alle, alle)
    return A, haps, truth


def test_phase_em_recovers_haplotypes():
    rng = np.random.default_rng(5)
    A, true_haps, truth = _window(rng)
    R, V = A.shape
    inp = PhaseEmInputs(
        alleles=jnp.asarray(A),
        var_weight=jnp.full(V, 2.0, dtype=jnp.float32),
        var_usable=jnp.ones(V, dtype=bool),
        hom_init=jnp.zeros(V, dtype=bool),
        read_mask=jnp.ones(R, dtype=bool),
        var_mask=jnp.ones(V, dtype=bool),
        seed_read=jnp.asarray(0, dtype=jnp.int32))
    cons, haps, n_it = phase_em(inp)
    cons = np.asarray(cons)
    haps = np.asarray(haps)
    # reads split into two consistent groups (labels may be swapped)
    g1 = haps[:20]
    g2 = haps[20:]
    assert len(set(g1.tolist())) == 1 and len(set(g2.tolist())) == 1
    assert g1[0] != g2[0] and g1[0] in (1, 2)
    # consensus matches the truth up to hap labeling
    c1 = cons[0 if g1[0] == 1 else 1]
    assert (c1 == truth).mean() > 0.95


def test_phase_em_hom_vars_and_masks():
    rng = np.random.default_rng(9)
    A, _, _ = _window(rng, n_reads=16, n_vars=8)
    R, V = A.shape
    pad_R, pad_V = 32, 16
    Ap = np.full((pad_R, pad_V), -1, dtype=np.int8)
    Ap[:R, :V] = A
    hom = np.zeros(pad_V, dtype=bool)
    hom[V - 1] = True
    usable = np.ones(pad_V, dtype=bool)
    usable[V - 1] = False
    inp = PhaseEmInputs(
        alleles=jnp.asarray(Ap),
        var_weight=jnp.where(jnp.asarray(usable), 2.0, 0.0).astype(jnp.float32),
        var_usable=jnp.asarray(usable),
        hom_init=jnp.asarray(hom),
        read_mask=jnp.asarray(np.arange(pad_R) < R),
        var_mask=jnp.asarray(np.arange(pad_V) < V),
        seed_read=jnp.asarray(0, dtype=jnp.int32))
    cons, haps, _ = phase_em(inp)
    haps = np.asarray(haps)
    assert (haps[R:] == 0).all()  # masked reads unassigned
