"""Noisy-region consensus + variant extraction (placeholder for round-1 WIP).

Target behavior: collect_noisy_reg_aln_strs (/root/reference/src/align.c:
1760-1813) — per-haplotype POA consensus, WFA ref<->cons alignment, variant
extraction from alignment strings (make_vars_from_msa_cons_aln,
collect_var.c:2279-2347).

Current state: regions are marked done without re-assembly (ret 0), i.e.
clean-region calling only.  The full engine is the next milestone.
"""

from __future__ import annotations

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.chunk import WindowChunk


def collect_noisy_vars1(opt: CallOpts, chunk: WindowChunk, reg_i: int) -> int:
    return 0
