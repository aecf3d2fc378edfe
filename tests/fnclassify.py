"""False-negative cause classification for the synthetic-F1 harness.

Round-4 review missing item 3: the recall tail (~3% of planted truth) was
a single undifferentiated number.  The reference's category machinery
(/root/reference/src/collect_var.c:413-434,902-1045) implies every miss
has a pipeline cause; this module re-runs each FN's window through the
production stages and buckets the miss:

Every bucket is a reference behavior with a citation — the reference
would miss these truths the same way:

  no_reads_in_window          no usable read covers the site (coverage
                              ramp at the synthetic contig's edges; the
                              reference needs DP >= min_dp,
                              collect_var.c:413-418)
  no_read_event_support       zero read digars carry a matching event —
                              the simulated alignment never expressed it
                              (digar collection, bam_utils.c:700-1327)
  alt_support_below_min       supporting reads < min_alt_dp(2)
                              (classify_var_cate low-cov arm,
                              collect_var.c:413-418, call_var_main.h:19)
  low_coverage_site           site depth < min_dp(5) (same arm)
  demoted_low_af_somatic      AF < min_af(0.2): candidate demoted to the
                              somatic class, dropped without -s
                              (var_is_cand_somatic promotion,
                              collect_var.c:796-811,902-1045)
  genotyped_refcall           candidate phased to 0/0 by the EM's hap
                              consensus (update_var_hap_to_cons_alle,
                              assign_hap.c:244-268)
  write_time_filtered         record made but killed by the write-time
                              DP/alt refilter (vcf_utils.c:108-114)
  dropped_in_noisy_reassembly site inside a noisy region whose candidates
                              classification removed
                              (collect_var.c:902-1045) and whose
                              re-assembly did not re-emit it — dominated
                              by regions > max_noisy_reg_len(50 kb) that
                              are skipped whole (collect_var.c:2653-2663,
                              call_var_main.h:42)
  classified_out_clean        killed by a classification arm outside any
                              noisy region (strand bias / repeat pushes,
                              collect_var.c:270-434)
  called_not_matched          a same-type record within the match window
                              was emitted (representation mismatch vs the
                              scorer, not a pipeline miss)
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from longcalld_tpu import config
from longcalld_tpu.core import genotype
from longcalld_tpu.core.pipeline import call_window, load_chunk
from longcalld_tpu.core.windows import Window
from longcalld_tpu.io.bam import CDEL, CDIFF, CINS


def _match_window(kind: str) -> int:
    return 0 if kind == "snv" else 60


def _event_matches(kind: str, length: int, pos1: int, e_pos: int,
                   e_type: int, e_len: int, tol_pos: int) -> bool:
    if kind == "snv":
        return e_type == CDIFF and e_pos == pos1
    want = CINS if kind == "ins" else CDEL
    if e_type != want or abs(e_pos - pos1) > tol_pos:
        return False
    lo, hi = min(e_len, length), max(e_len, length)
    return lo >= 0.7 * hi


def _classify_one(opt, chunk, kind: str, pos0: int, length: int,
                  made_positions: Dict[int, list]) -> str:
    pos1 = pos0 + 1                     # digar/cand coordinates are 1-based
    tol = _match_window("snv" if kind == "snv" else "indel")
    if kind != "snv":
        tol = max(tol, length)

    # 1. read-event support straight from the digars
    n_alt = 0
    n_cov = 0
    for ri in chunk.order:
        d = chunk.digars[ri]
        if d is None:
            continue
        if d.beg > pos1 or d.end < pos1:
            continue
        n_cov += 1
        m = d.var_mask()
        for k in np.nonzero(m)[0]:
            if _event_matches(kind, length, pos1, int(d.pos[k]),
                              int(d.type[k]), int(d.len[k]), tol):
                n_alt += 1
                break
    if n_cov == 0:
        return "no_reads_in_window"
    if n_alt == 0:
        return "no_read_event_support"

    # 2. emitted-but-unmatched: a same-type record exists nearby
    #    (left-normalization / representation difference, not a miss)
    for mp in made_positions.get(kind, []):
        if abs(mp - pos1) <= max(tol, 1 if kind == "snv" else 25):
            return "called_not_matched"

    # 3. the final candidate list
    cand = chunk.cand_vars
    cate = chunk.var_cate
    found = -1
    if cand is not None:
        want_t = CDIFF if kind == "snv" else (CINS if kind == "ins"
                                              else CDEL)
        for i in range(len(cand)):
            cp = int(cand.pos[i])
            if cand.type[i] != want_t:
                continue
            if kind == "snv":
                if cp == pos1:
                    found = i
                    break
            elif abs(cp - pos1) <= max(tol, 25):
                e_len = int(cand.alt_len[i] if kind == "ins"
                            else cand.ref_len[i])
                lo, hi = min(e_len, length), max(e_len, length)
                if lo >= 0.7 * hi:
                    found = i
                    break
    if found >= 0:
        c = int(cate[found])
        if c == config.CAND_SOMATIC_VAR:
            return "demoted_low_af_somatic"
        if cand.hap_cons_alle is not None and \
                cand.hap_cons_alle[found, 1] <= 0 and \
                cand.hap_cons_alle[found, 2] <= 0:
            return "genotyped_refcall"
        dp = int(cand.total_cov[found])
        ad1 = int(cand.alle_covs[found, 1])
        if dp < opt.min_dp or ad1 < opt.min_alt_dp:
            return "write_time_filtered"
        return "called_not_matched"

    # 4. not a surviving candidate
    in_noisy = False
    if chunk.noisy_regs is not None and len(chunk.noisy_regs) > 0:
        lo = pos1 - (tol if kind != "snv" else 0)
        hi = pos1 + (tol if kind != "snv" else 0)
        in_noisy = len(chunk.noisy_regs.overlap_indices(lo, hi)) > 0
    if in_noisy:
        return "dropped_in_noisy_reassembly"
    if n_alt < opt.min_alt_dp:
        return "alt_support_below_min"
    if n_cov < opt.min_dp:
        return "low_coverage_site"
    if n_alt < opt.min_af * n_cov:
        return "demoted_low_af_somatic"
    return "classified_out_clean"


def classify_fn_causes(opt, fasta, bams, fns: Dict[str, list],
                       tname: str, contig_len: int,
                       max_examples: int = 3) -> dict:
    """Bucket every FN by pipeline cause.  ``fns`` is evaluate_f1's
    return_fns payload: snv [(pos0, alt4)], indel/sv [(anchor0, kind,
    len)].  Windows containing FNs are re-run once each through
    load_chunk + call_window (host-only)."""
    import dataclasses

    opt = dataclasses.replace(opt, use_device=False, host_procs=0)
    wsize = opt.window_size
    items: List[Tuple[int, str, int, int]] = []   # (pos0, kind, len, cls_i)
    for p, _alt in fns.get("snv", []):
        items.append((int(p), "snv", 1, 0))
    for a, k, ln in fns.get("indel", []):
        items.append((int(a), k, int(ln), 1))
    for a, k, ln in fns.get("sv", []):
        items.append((int(a), k, int(ln), 2))

    by_win: Dict[int, list] = {}
    for it in items:
        by_win.setdefault(it[0] // wsize, []).append(it)

    tid = bams[0].name2tid(tname) if hasattr(bams[0], "name2tid") else 0
    hist: Dict[str, dict] = {}
    for wi in sorted(by_win):
        beg = wi * wsize + 1
        end = min((wi + 1) * wsize, contig_len)
        win = Window(tid, tname, beg, end, 0, wi)
        chunk = load_chunk(opt, fasta, bams, win, None, None)
        made_positions: Dict[str, list] = {}
        if chunk is not None:
            call_window(opt, chunk)
            for v in genotype.make_variants(opt, chunk):
                if v.n_alt_allele == 0 or v.dp < opt.min_dp \
                        or v.ad[1] < opt.min_alt_dp:
                    continue
                a0 = v.alt_bases[0]
                if v.ref_len == 1 and len(a0) == 1:
                    made_positions.setdefault("snv", []).append(v.pos)
                elif len(a0) > v.ref_len:
                    made_positions.setdefault("ins", []).append(v.pos)
                else:
                    made_positions.setdefault("del", []).append(v.pos)
        for pos0, kind, length, cls_i in by_win[wi]:
            if chunk is None:
                cause = "no_reads_in_window"
            else:
                cause = _classify_one(opt, chunk, kind, pos0, length,
                                      made_positions)
            b = hist.setdefault(cause, {"n": 0, "by_class": [0, 0, 0],
                                        "examples": []})
            b["n"] += 1
            b["by_class"][cls_i] += 1
            if len(b["examples"]) < max_examples:
                b["examples"].append(f"{tname}:{pos0 + 1}:{kind}{length}")
    total = sum(b["n"] for b in hist.values())
    return {
        "total_fns": total,
        "buckets": dict(sorted(hist.items(), key=lambda kv: -kv[1]["n"])),
        "by_class_order": ["snv", "indel", "sv"],
    }
