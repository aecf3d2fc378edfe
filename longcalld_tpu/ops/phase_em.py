"""Device phasing kernel: batched haplotype-assignment EM as MXU matmuls.

TPU-native formulation of the reference's read-to-haplotype EM
(iter_update_var_hap_to_cons_alle, /root/reference/src/assign_hap.c:425-467):

* allele matrix A in {-2,-1,0,1} is encoded as D = [A==0] - [A==1]
  (int8 -> bf16/f32), so the per-read hap score
      score[r,h] = sum_v w[v] * agree(A[r,v], cons[h,v])
  collapses to ONE (R,V)x(V,2) matmul with
      S[v,h] = w[v] * (1 - 2*cons[h,v]) masked to set consensus entries.
* consensus update is the transposed matmul: per-hap allele counts
      cnt[h,v,a] = H^T @ [A==a]   (H one-hot read-hap assignment)
  followed by an elementwise argmax (ref preferred on ties, like
  update_var_hap_to_cons_alle assign_hap.c:244-268).
* iterations run under lax.while_loop to a fixpoint (<=10, like the C),
  entirely on device; batches of windows vmap over the leading axis.

This is the throughput path; longcalld_tpu.core.phase is the sequential
parity oracle it is validated against.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PhaseEmInputs(NamedTuple):
    """Fixed-shape window tensors (pad reads/vars; mask via *_mask)."""
    alleles: jax.Array      # int8 (R, V): -2/-1/0/1
    var_weight: jax.Array   # f32 (V,): 2.0 clean het SNP/indel, 1.0 noisy, 0 unused
    var_usable: jax.Array   # bool (V,): participates in scoring (het, non-HP)
    hom_init: jax.Array     # bool (V,): initialized as hom (cons=alt on both)
    read_mask: jax.Array    # bool (R,)
    var_mask: jax.Array     # bool (V,)
    seed_read: jax.Array    # int32 scalar: read whose alleles seed cluster 1
                            # (the reference seeds from the deepest clean het
                            # var and the first read covering it,
                            # select_init_var assign_hap.c:94-125)


class PhaseEmState(NamedTuple):
    cons: jax.Array         # int8 (2, V): -1 unset / 0 ref / 1 alt
    haps: jax.Array         # int8 (R,): 0 unassigned / 1 / 2
    it: jax.Array
    changed: jax.Array


def _score_matmul(D: jax.Array, cons: jax.Array, w: jax.Array,
                  usable: jax.Array) -> jax.Array:
    """score[r,h] = D @ S with S[v,h] = w[v]*(1-2*cons[h,v]) for set cons."""
    set_m = (cons >= 0).astype(jnp.float32)          # (2, V)
    sgn = (1.0 - 2.0 * cons.astype(jnp.float32)) * set_m
    S = (w * usable)[:, None] * sgn.T                # (V, 2)
    return jnp.dot(D, S, preferred_element_type=jnp.float32)  # (R, 2)


def _assign_from_scores(scores: jax.Array, any_usable: jax.Array) -> jax.Array:
    """1/2 by sign structure of the two hap scores; 0 on ties/no-signal.

    Mirrors init_assign_read_hap_based_on_cons_alle's max/min logic
    (assign_hap.c:182-197): positive max wins; otherwise the negative min's
    complement wins.
    """
    s1, s2 = scores[:, 0], scores[:, 1]
    max_s = jnp.maximum(s1, s2)
    min_s = jnp.minimum(s1, s2)
    max_hap = jnp.where(s1 >= s2, 1, 2)
    min_hap = jnp.where(s1 <= s2, 1, 2)
    hap = jnp.where(max_s > 0, max_hap,
                    jnp.where(min_s < 0, 3 - min_hap, 0))
    return jnp.where(any_usable, hap, 0).astype(jnp.int8)


def _consensus_from_haps(haps: jax.Array, A0: jax.Array, A1: jax.Array,
                         read_mask: jax.Array) -> jax.Array:
    """cons[h,v] = argmax_a count(hap==h+1, allele==a); -1 when count 0;
    ref preferred on ties."""
    H = jnp.stack([(haps == 1), (haps == 2)], axis=1).astype(jnp.float32)
    H = H * read_mask[:, None].astype(jnp.float32)
    c0 = jnp.dot(H.T, A0, preferred_element_type=jnp.float32)  # (2, V)
    c1 = jnp.dot(H.T, A1, preferred_element_type=jnp.float32)
    cons = jnp.where(c1 > c0, 1, 0)
    cons = jnp.where((c0 == 0) & (c1 == 0), -1, cons)
    return cons.astype(jnp.int8)


def _complement_fill(cons: jax.Array, usable: jax.Array) -> jax.Array:
    """If exactly one hap's consensus is set for a usable var, fill the other
    with the complement (read_to_cons_allele_score's -1 filling,
    assign_hap.c:139-143)."""
    c1, c2 = cons[0], cons[1]
    f1 = jnp.where((c1 < 0) & (c2 >= 0) & usable, 1 - c2, c1)
    f2 = jnp.where((c2 < 0) & (c1 >= 0) & usable, 1 - c1, c2)
    return jnp.stack([f1, f2]).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("max_iter",))
def phase_em(inputs: PhaseEmInputs, max_iter: int = 10
             ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run the EM to fixpoint.  Returns (cons (2,V) int8, haps (R,) int8,
    n_iters)."""
    A = inputs.alleles
    vm = inputs.var_mask & inputs.var_usable
    A0 = ((A == 0) & vm[None, :]).astype(jnp.float32)
    A1 = ((A == 1) & vm[None, :]).astype(jnp.float32)
    A0 = A0 * inputs.read_mask[:, None]
    A1 = A1 * inputs.read_mask[:, None]
    D = A0 - A1
    w = inputs.var_weight
    usable = vm

    # init: hom vars start at cons=1/1; others unset (assign_hap.c:39-63);
    # cluster 1 seeded from the seed read's alleles to break symmetry
    seed_onehot = (jnp.arange(A.shape[0]) == inputs.seed_read)
    seed_alleles = jnp.where(
        (jnp.max(jnp.where(seed_onehot[:, None], A, -1), axis=0) >= 0) & vm,
        jnp.max(jnp.where(seed_onehot[:, None], A, -1), axis=0), -1)
    hom_row = jnp.where(inputs.hom_init & inputs.var_mask, 1, -1)
    cons0 = jnp.stack([
        jnp.where(hom_row == 1, 1, seed_alleles),
        hom_row]).astype(jnp.int8)
    # seed assignment from initial consensus
    any_usable = (jnp.abs(D) * (w * usable)[None, :]).sum(axis=1) > 0

    def body(state: PhaseEmState) -> PhaseEmState:
        cons = _complement_fill(state.cons, usable)
        scores = _score_matmul(D, cons, w, usable)
        haps = _assign_from_scores(scores, any_usable)
        new_cons = _consensus_from_haps(haps, A0, A1, inputs.read_mask)
        # hom-init vars keep participating; unset stays -1
        changed = jnp.any(new_cons != state.cons) | jnp.any(haps != state.haps)
        return PhaseEmState(new_cons, haps, state.it + 1, changed)

    def cond(state: PhaseEmState) -> jax.Array:
        return state.changed & (state.it < max_iter)

    # derive the init carry from inputs so its sharding axes match the body
    # outputs under shard_map (replicated literals vs dp-varying values)
    init = PhaseEmState(cons0,
                        jnp.zeros_like(A[:, 0]).astype(jnp.int8),
                        jnp.array(0, dtype=jnp.int32),
                        jnp.any(inputs.var_mask) | jnp.array(True))
    final = jax.lax.while_loop(cond, body, init)
    cons = _complement_fill(final.cons, usable)
    return cons, final.haps, final.it


def phase_em_batched(inputs: PhaseEmInputs, max_iter: int = 10):
    """vmap over a leading window axis (all fields stacked)."""
    return jax.vmap(lambda a, w_, u, h, rm, vm, sr: phase_em(
        PhaseEmInputs(a, w_, u, h, rm, vm, sr), max_iter))(
            inputs.alleles, inputs.var_weight, inputs.var_usable,
            inputs.hom_init, inputs.read_mask, inputs.var_mask,
            inputs.seed_read)


# ---------- host bridge ----------

def build_inputs_from_chunk(chunk, opt, target_cate: int,
                            pad_reads: int = 0, pad_vars: int = 0
                            ) -> PhaseEmInputs:
    """Pack a WindowChunk's profile into fixed-shape device tensors."""
    from longcalld_tpu import config
    cand = chunk.cand_vars
    n_reads = chunk.n_reads
    n_vars = len(cand)
    R = max(pad_reads, n_reads)
    V = max(pad_vars, n_vars)
    alleles = np.full((R, V), -1, dtype=np.int8)
    if chunk.alleles is not None:
        alleles[:n_reads, :n_vars] = chunk.alleles
    cate = chunk.var_cate
    w = np.zeros(V, dtype=np.float32)
    usable = np.zeros(V, dtype=bool)
    hom = np.zeros(V, dtype=bool)
    for i in range(n_vars):
        c = int(cate[i])
        if (c & target_cate) == 0:
            continue
        is_hp = (cand.is_homopolymer_indel is not None
                 and bool(cand.is_homopolymer_indel[i]))
        if c in (config.CLEAN_HOM_VAR, config.NOISY_CAND_HOM_VAR):
            hom[i] = True
            continue
        if is_hp:
            continue
        usable[i] = True
        w[i] = 2.0 if c in (config.CLEAN_HET_SNP, config.CLEAN_HET_INDEL) \
            else 1.0
    read_mask = np.zeros(R, dtype=bool)
    for ri in chunk.order:
        if chunk.digars[ri] is not None:
            read_mask[ri] = True
    var_mask = np.zeros(V, dtype=bool)
    var_mask[:n_vars] = True
    # seed: deepest clean-het var's first covering read (chunk order)
    seed_read = 0
    best_v, best_cov = -1, -1
    for i in range(n_vars):
        if usable[i] and int(cand.total_cov[i]) > best_cov:
            best_v, best_cov = i, int(cand.total_cov[i])
    if best_v >= 0 and chunk.alleles is not None:
        for ri in chunk.order:
            if chunk.digars[ri] is None:
                continue
            if (chunk.read_start_var[ri] >= 0
                    and chunk.read_start_var[ri] <= best_v
                    <= chunk.read_end_var[ri]
                    and chunk.alleles[ri, best_v] >= 0):
                seed_read = ri
                break
    return PhaseEmInputs(
        alleles=jnp.asarray(alleles), var_weight=jnp.asarray(w),
        var_usable=jnp.asarray(usable), hom_init=jnp.asarray(hom),
        read_mask=jnp.asarray(read_mask), var_mask=jnp.asarray(var_mask),
        seed_read=jnp.asarray(seed_read, dtype=jnp.int32))
