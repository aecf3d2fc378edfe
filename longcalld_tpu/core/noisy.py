"""Noisy-region re-assembly driver.

Re-implements the outer loop of collect_var_main's noisy-region stage
(/root/reference/src/collect_var.c:2947-2977) and collect_noisy_vars1
(:2648-2741): per region, build per-haplotype consensus, re-align
ref<->cons and cons<->reads, derive variants, merge into the window state and
re-phase.

The consensus + alignment engine lives in longcalld_tpu.core.consensus and
longcalld_tpu.ops.wfa.
"""

from __future__ import annotations

from typing import List

import numpy as np

from longcalld_tpu import config
from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.chunk import WindowChunk
from longcalld_tpu.core.phase import assign_haplotypes


def sort_noisy_regs(chunk: WindowChunk) -> List[int]:
    """Order regions by label (contained var size) then length
    (sort_noisy_regs, collect_var.c:2745-2769)."""
    regs = chunk.noisy_regs
    n = len(regs)
    lens = (regs.ends - regs.starts).astype(np.int64)
    labs = regs.labels
    return sorted(range(n), key=lambda i: (int(labs[i]), int(lens[i])))


def process_noisy_regions(opt: CallOpts, chunk: WindowChunk) -> None:
    from longcalld_tpu.core.consensus import collect_noisy_vars1
    order = sort_noisy_regs(chunk)
    done = [False] * len(order)
    while True:
        new_done = False
        new_var = False
        for reg_i in order:
            if done[reg_i]:
                continue
            ret = collect_noisy_vars1(opt, chunk, reg_i)
            if ret >= 0:
                done[reg_i] = True
                new_done = True
                if ret > 0:
                    new_var = True
        if new_var:
            assign_haplotypes(opt, chunk, config.CAND_GERMLINE_VAR_CATE)
        if not new_done:
            break
