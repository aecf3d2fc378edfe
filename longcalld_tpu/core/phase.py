"""Local haplotagging: iterative 2-cluster EM over the read x variant matrix.

Host reference implementation of assign_hap_based_on_germline_het_vars_kmeans
(/root/reference/src/assign_hap.c:16-547): seed at the deepest clean het SNP,
sweep outward assigning reads to the haplotype maximizing weighted allele
agreement, then iterate (phase-set segmentation + consensus flip) and (read
re-assignment + consensus update) to a fixpoint (<=10 iterations).

The sequential sweep semantics (consensus updates feed later reads) are kept
exactly; the device kernel in longcalld_tpu.ops.phase_em batches the
fixpoint iterations as masked matmuls and is validated against this module.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from longcalld_tpu import config
from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.chunk import WindowChunk
from longcalld_tpu.io.bam import CDIFF

HOM, H1, H2 = 0, 1, 2


def _init_max_cov_allele(opt: CallOpts, cand, i: int) -> int:
    """get_var_init_max_cov_allele (assign_hap.c:22-34)."""
    if opt.is_ont and cand.is_homopolymer_indel is not None \
            and cand.is_homopolymer_indel[i]:
        return -1
    covs = cand.alle_covs[i]
    max_cov, max_i = 0, -1
    for a in range(2):
        if covs[a] > max_cov:
            max_cov = int(covs[a])
            max_i = a
    return max_i


def init_var_hap_state(opt: CallOpts, chunk: WindowChunk,
                       valid_idx: np.ndarray) -> None:
    """var_init_hap_profile_cons_allele (assign_hap.c:39-63)."""
    cand = chunk.cand_vars
    n = len(cand)
    if cand.hap_cons_alle is None:
        cand.hap_cons_alle = np.full((n, 3), -1, dtype=np.int8)
        cand.hap_profile = np.zeros((n, 3, 2), dtype=np.int32)
        # phase_set starts at 0 = "unset" (init_cand_vars_based_on_sites,
        # collect_var.c:28) so unphased vars print '/' genotypes
        cand.phase_set = np.zeros(n, dtype=np.int64)
    for vi in valid_idx:
        cand.hap_profile[vi, 1:] = 0
        cand.hap_cons_alle[vi, HOM] = _init_max_cov_allele(opt, cand, vi)
        if chunk.var_cate[vi] in (config.NOISY_CAND_HOM_VAR,
                                  config.CLEAN_HOM_VAR):
            cand.hap_cons_alle[vi, 1:] = 1
        else:
            cand.hap_cons_alle[vi, 1:] = -1


def select_init_var(chunk: WindowChunk, valid_idx: np.ndarray) -> int:
    """Deepest clean het SNP > clean het indel > noisy het SNP > noisy het
    non-HP indel (select_init_var, assign_hap.c:94-125).  Returns position
    within valid_idx or -1."""
    cand = chunk.cand_vars
    cate = chunk.var_cate
    best = {k: (-1, 0) for k in range(4)}
    for j, vi in enumerate(valid_idx):
        c = cate[vi]
        cov = int(cand.total_cov[vi])
        if c == config.CLEAN_HET_SNP:
            k = 0
        elif c == config.CLEAN_HET_INDEL:
            k = 1
        elif c == config.NOISY_CAND_HET_VAR:
            if cand.type[vi] == CDIFF:
                k = 2
            elif (cand.is_homopolymer_indel is None
                  or not cand.is_homopolymer_indel[vi]):
                k = 3
            else:
                continue
        else:
            continue
        if best[k][0] == -1 or best[k][1] < cov:
            best[k] = (j, cov)
    for k in range(4):
        if best[k][0] != -1:
            return best[k][0]
    return -1


def _cons_score(cand, cate: int, vi: int, hap: int, allele: int) -> int:
    """read_to_cons_allele_score (assign_hap.c:127-147).  NOTE: mutates
    hap_cons_alle to fill a one-sided -1 with the complement, like the C."""
    var_score = 2 if cate in (config.CLEAN_HET_SNP,
                              config.CLEAN_HET_INDEL) else 1
    hc = cand.hap_cons_alle[vi]
    if hc[hap] == -1 and hc[3 - hap] == -1:
        return 0
    if hc[hap] == -1:
        hc[hap] = 1 - hc[3 - hap]
    if hc[3 - hap] == -1:
        hc[3 - hap] = 1 - hc[hap]
    if hc[hap] == allele:
        return var_score
    if hc[hap] == -1:
        return 0
    return -var_score


def assign_read_hap(chunk: WindowChunk, read_i: int, target_cate: int
                    ) -> int:
    """init_assign_read_hap_based_on_cons_alle (assign_hap.c:151-198).
    Returns -1 (no usable var), 0 (tied) or 1/2; updates the read's
    clean-SNP agree/conflict counters."""
    cand = chunk.cand_vars
    cate = chunk.var_cate
    p_start = int(chunk.read_start_var[read_i])
    p_end = int(chunk.read_end_var[read_i])
    chunk.n_clean_agree_snps[read_i] = 0
    chunk.n_clean_conflict_snps[read_i] = 0
    hap_scores = [0, 0, 0]
    n_used = [0, 0, 0]
    agree = [0, 0, 0]
    conflict = [0, 0, 0]
    if p_start < 0:
        return -1
    alleles = chunk.alleles[read_i]
    for vi in range(p_start, p_end + 1):
        c = int(cate[vi])
        if (c & target_cate) == 0:
            continue
        if ((cand.is_homopolymer_indel is not None
             and cand.is_homopolymer_indel[vi])
                or c == config.NOISY_CAND_HOM_VAR):
            continue
        allele = int(alleles[vi])
        if allele < 0:
            continue
        for hap in (1, 2):
            s = _cons_score(cand, c, vi, hap, allele)
            if s != 0:
                if c != config.CLEAN_HOM_VAR:
                    n_used[hap] += 1
                if (c & config.CAND_GERMLINE_CLEAN_VAR_CATE) \
                        and cand.type[vi] == CDIFF:
                    if s > 0:
                        agree[hap] += 1
                    else:
                        conflict[hap] += 1
            if c != config.CLEAN_HOM_VAR:
                hap_scores[hap] += s
    max_hap = min_hap = 0
    max_score = min_score = 0
    for hap in (1, 2):
        if hap_scores[hap] > max_score:
            max_hap, max_score = hap, hap_scores[hap]
        elif hap_scores[hap] < min_score:
            min_hap, min_score = hap, hap_scores[hap]
    if n_used[1] == 0 and n_used[2] == 0:
        return -1
    if max_score == 0 and min_score == 0:
        return 0
    if max_score > 0:
        chunk.n_clean_agree_snps[read_i] = agree[max_hap]
        chunk.n_clean_conflict_snps[read_i] = conflict[max_hap]
        return max_hap
    return 3 - min_hap


def _update_cons_from_profile(opt: CallOpts, cand, cate: int, vi: int,
                              hap: int) -> None:
    """update_var_hap_to_cons_alle (assign_hap.c:244-268)."""
    if hap == 0:
        return
    prof = cand.hap_profile[vi, hap]
    max_cov, max_i = 0, -1
    total = 0
    for a in range(2):
        total += int(prof[a])
        if prof[a] > max_cov:
            max_cov = int(prof[a])
            max_i = a
    if (opt.is_ont and cand.is_homopolymer_indel is not None
            and cand.is_homopolymer_indel[vi] and max_cov < total * 0.67):
        max_i = -1
    cand.hap_cons_alle[vi, hap] = max_i


def _apply_read_to_profiles(opt: CallOpts, chunk: WindowChunk, read_i: int,
                            hap: int, target_cate: int,
                            update_cons: bool) -> None:
    """update_var_hap_profile{_cons_alle}_based_on_read_hap
    (assign_hap.c:270-305)."""
    cand = chunk.cand_vars
    cate = chunk.var_cate
    p_start = int(chunk.read_start_var[read_i])
    p_end = int(chunk.read_end_var[read_i])
    if p_start < 0:
        return
    alleles = chunk.alleles[read_i]
    for vi in range(p_start, p_end + 1):
        c = int(cate[vi])
        if (c & target_cate) == 0:
            continue
        allele = int(alleles[vi])
        if allele < 0:
            continue
        haps = (1, 2) if hap == 0 else (hap,)
        for h in haps:
            cand.hap_profile[vi, h, allele] += 1
            if update_cons:
                _update_cons_from_profile(opt, cand, c, vi, h)


def _reads_covering_var(chunk: WindowChunk, vi: int) -> List[int]:
    """Reads whose profile span contains var vi, in (start_var, end_var,
    insertion-order) — matches the cgranges read_var_cr iteration order."""
    order = chunk._read_var_order
    starts = chunk.read_start_var[order]
    ends = chunk.read_end_var[order]
    m = (starts <= vi) & (ends >= vi)
    return [int(order[k]) for k in np.nonzero(m)[0]]


def _reads_covering_range(chunk: WindowChunk, v1: int, v2: int) -> List[int]:
    order = chunk._read_var_order
    starts = chunk.read_start_var[order]
    ends = chunk.read_end_var[order]
    m = (starts < v2) & (ends >= v1)
    return [int(order[k]) for k in np.nonzero(m)[0]]


def _prepare_read_var_order(chunk: WindowChunk) -> None:
    reads = [ri for ri in chunk.order
             if chunk.digars[ri] is not None
             and chunk.read_start_var[ri] >= 0]
    keys = [(int(chunk.read_start_var[r]), int(chunk.read_end_var[r]) + 1)
            for r in reads]
    idx = sorted(range(len(reads)), key=lambda k: keys[k])
    chunk._read_var_order = np.array([reads[k] for k in idx], dtype=np.int64)


def _iter_update_phase_set(chunk: WindowChunk, valid_idx: np.ndarray) -> bool:
    """iter_update_var_hap_cons_phase_set (assign_hap.c:345-422): phase-set
    segmentation from adjacent-het read agreement, plus consensus flipping."""
    cand = chunk.cand_vars
    n_valid = len(valid_idx)
    is_het = np.zeros(n_valid, dtype=bool)
    het_pos: List[int] = []
    for j, vi in enumerate(valid_idx):
        hc = cand.hap_cons_alle[vi]
        hp = (cand.is_homopolymer_indel is not None
              and cand.is_homopolymer_indel[vi])
        if hc[1] != -1 and hc[2] != -1 and hc[1] != hc[2] and not hp:
            is_het[j] = True
            het_pos.append(j)
    n_agree = np.zeros(n_valid, dtype=np.int64)
    n_conflict = np.zeros(n_valid, dtype=np.int64)
    for k in range(1, len(het_pos)):
        j = het_pos[k]
        vi = int(valid_idx[j])
        prev_vi = int(valid_idx[het_pos[k - 1]])
        for read_i in _reads_covering_range(chunk, prev_vi, vi + 1):
            hap = int(chunk.haps[read_i])
            if hap == 0:
                continue
            ps, pe = int(chunk.read_start_var[read_i]), int(chunk.read_end_var[read_i])
            if prev_vi < ps or vi > pe:
                continue
            a1 = int(chunk.alleles[read_i][prev_vi])
            a2 = int(chunk.alleles[read_i][vi])
            if a1 < 0 or a2 < 0:
                continue
            agree = (cand.hap_cons_alle[prev_vi, hap] == a1
                     and cand.hap_cons_alle[vi, hap] == a2)
            confl = (cand.hap_cons_alle[prev_vi, hap] == a1
                     and cand.hap_cons_alle[vi, 3 - hap] == a2)
            if agree:
                n_agree[j] += 1
            elif confl:
                n_conflict[j] += 1
    changed = False
    flip = 0
    phase_set = -1
    for j in range(n_valid):
        vi = int(valid_idx[j])
        if j == 0:
            phase_set = (int(cand.pos[vi]) if cand.type[vi] == CDIFF
                         else int(cand.pos[vi]) - 1)
            cand.phase_set[vi] = phase_set
            continue
        if is_het[j]:
            if n_agree[j] < 2 and n_conflict[j] < 2:
                phase_set = (int(cand.pos[vi]) if cand.type[vi] == CDIFF
                             else int(cand.pos[vi]) - 1)
            elif n_conflict[j] > n_agree[j]:
                flip ^= 1
            if flip == 1:
                changed = True
                cand.hap_cons_alle[vi, 1], cand.hap_cons_alle[vi, 2] = (
                    cand.hap_cons_alle[vi, 2], cand.hap_cons_alle[vi, 1])
        cand.phase_set[vi] = phase_set
    return changed


def _iter_update_cons(opt: CallOpts, chunk: WindowChunk,
                      valid_idx: np.ndarray, target_cate: int) -> bool:
    """iter_update_var_hap_to_cons_alle (assign_hap.c:425-467)."""
    cand = chunk.cand_vars
    prev = cand.hap_cons_alle[valid_idx, 1:].copy()
    cand.hap_profile[valid_idx, :, :] = 0
    for ri in chunk.order:
        if chunk.digars[ri] is None:
            continue
        hap = assign_read_hap(chunk, ri, target_cate)
        if hap == -1:
            hap = 0
        chunk.haps[ri] = hap
        _apply_read_to_profiles(opt, chunk, ri, hap, target_cate,
                                update_cons=False)
    for vi in valid_idx:
        for hap in (1, 2):
            _update_cons_from_profile(opt, cand, int(chunk.var_cate[vi]),
                                      int(vi), hap)
    return bool((cand.hap_cons_alle[valid_idx, 1:] != prev).any())


def _update_read_phase_sets(chunk: WindowChunk, valid_mask: np.ndarray) -> None:
    """update_read_phase_set (assign_hap.c:322-339)."""
    cand = chunk.cand_vars
    for ri in chunk.order:
        if chunk.digars[ri] is None:
            continue
        ps_out = -1
        p_start = int(chunk.read_start_var[ri])
        if p_start < 0:
            continue
        for vi in range(p_start, int(chunk.read_end_var[ri]) + 1):
            if not valid_mask[vi]:
                continue
            hc = cand.hap_cons_alle[vi]
            if hc[1] != -1 and hc[2] != -1 and hc[1] != hc[2]:
                ps_out = int(cand.phase_set[vi])
            if ps_out != -1:
                break
        chunk.phase_sets[ri] = ps_out


def assign_haplotypes(opt: CallOpts, chunk: WindowChunk,
                      target_cate: int) -> None:
    """Top-level phasing driver (assign_hap.c:473-547)."""
    cand = chunk.cand_vars
    n_vars = len(cand)
    if n_vars == 0:
        return
    valid_mask = (chunk.var_cate & target_cate) != 0
    valid_idx = np.nonzero(valid_mask)[0]
    if len(valid_idx) == 0:
        return

    chunk.haps[:] = 0
    chunk.phase_sets[:] = -1
    init_var_hap_state(opt, chunk, valid_idx)
    _prepare_read_var_order(chunk)

    init_j = select_init_var(chunk, valid_idx)
    if init_j != -1:
        sweep = [init_j] + list(range(init_j - 1, -1, -1)) \
            + list(range(init_j + 1, len(valid_idx)))
        for j in sweep:
            vi = int(valid_idx[j])
            c = int(chunk.var_cate[vi])
            if c in (config.NOISY_CAND_HOM_VAR, config.CLEAN_HOM_VAR):
                continue
            for read_i in _reads_covering_var(chunk, vi):
                if chunk.haps[read_i] != 0:
                    continue
                hap = assign_read_hap(chunk, read_i, target_cate)
                if hap == -1:
                    hap = 1
                chunk.haps[read_i] = hap
                _apply_read_to_profiles(opt, chunk, read_i, hap, target_cate,
                                        update_cons=True)

    for _ in range(10):
        changed1 = _iter_update_phase_set(chunk, valid_idx)
        changed2 = _iter_update_cons(opt, chunk, valid_idx, target_cate)
        if not changed1 and not changed2:
            break
    _update_read_phase_sets(chunk, valid_mask)
