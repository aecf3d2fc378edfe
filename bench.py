#!/usr/bin/env python3
"""Benchmark: HG002 chr11 HiFi end-to-end variant calling on real TPU.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: aligned read megabases processed per second for the full `call`
pipeline (BAM -> digars -> candidates -> phasing -> noisy-region
re-assembly with device alignment kernels -> VCF).

vs_baseline: ratio against an ESTIMATED reference-C throughput of 1.2 Mbp/s
on this workload (longcallD itself cannot be built in this image — its
htslib/abPOA/WFA2-lib submodule sources are absent from the snapshot, see
SURVEY.md section 6 — so the baseline is an estimate pending a real
measurement: ~5 s for the 6.04 Mbp smoke workload, single node, default
threads).
"""

import io
import json
import sys
import time

REF = "/root/reference/test_data/chr11_2M.fa"
BAM = "/root/reference/test_data/HG002_chr11_hifi_test.bam"
C_BASELINE_EST_MBP_S = 1.2


def main() -> None:
    from longcalld_tpu.config import CallOpts
    from longcalld_tpu.core.pipeline import run_call
    from longcalld_tpu.io.bam import BamReader

    bam = BamReader(BAM)
    tid = bam.name2tid("chr11")
    total_bp = sum(r.l_seq for r in bam.fetch(tid, 0, 2_000_000))
    mbp = total_bp / 1e6

    opt = CallOpts.hifi(ref_fa_fn=REF, in_bam_fns=[BAM])

    # timed run (cold process: includes per-shape lowering; XLA binaries come
    # from the persistent compilation cache when it is warm)
    t0 = time.time()
    buf = io.StringIO()
    n_vars = run_call(opt, buf, "bench")
    wall = time.time() - t0

    # warm passes show the steady-state (all shapes traced) rate; the
    # tunneled device link's dispatch latency varies several-fold run to
    # run, so take the best of three as the steady-state measurement
    # clear content-addressed alignment memos between passes: compiled
    # executables staying warm is real steady-state, but reusing the
    # previous pass's alignment RESULTS on identical reads would not
    # happen on fresh genomic windows
    from longcalld_tpu.ops import wfa as _wfa

    warms = []
    for _ in range(3):
        for al in _wfa._ALIGNER_CACHE.values():
            al.memo_clear()
        t0 = time.time()
        run_call(opt, io.StringIO(), "bench")
        warms.append(time.time() - t0)
    wall_warm = min(warms)

    # multi-window mode (kt_for analog): same workload cut into 50 kb
    # windows with boundary stitching, 2 stage-0 workers
    opt_mw = CallOpts.hifi(ref_fa_fn=REF, in_bam_fns=[BAM],
                           window_size=50_000, n_threads=2)
    run_call(opt_mw, io.StringIO(), "bench")       # warm the window shapes
    mw = []
    for _ in range(2):
        for al in _wfa._ALIGNER_CACHE.values():
            al.memo_clear()
        t0 = time.time()
        n_mw = run_call(opt_mw, io.StringIO(), "bench")
        mw.append(time.time() - t0)
    assert n_mw == n_vars, "multi-window VCF diverged from single-window"

    mbp_s = mbp / wall_warm
    print(f"cold: {wall:.1f}s  warm: {[round(w, 1) for w in warms]}s  "
          f"multiwin: {[round(w, 1) for w in mw]}s  "
          f"vars: {n_vars}  aligned: {mbp:.2f} Mbp", file=sys.stderr)
    print(json.dumps({
        "metric": "hg002_chr11_hifi_e2e_throughput",
        "value": round(mbp_s, 3),
        "unit": "Mbp/s",
        "vs_baseline": round(mbp_s / C_BASELINE_EST_MBP_S, 3),
        "detail": {
            "wall_cold_s": round(wall, 1),
            "wall_warm_s": round(wall_warm, 1),
            "wall_warm_all_s": [round(w, 1) for w in warms],
            "wall_multiwindow_s": round(min(mw), 1),
            "n_vars": n_vars,
            "aligned_mbp": round(mbp, 2),
            "baseline_note": "C baseline estimated (reference submodules "
                             "absent; cannot build longcallD in-image)",
        },
    }))


if __name__ == "__main__":
    main()
