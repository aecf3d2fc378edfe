#!/usr/bin/env python3
"""Benchmark: HG002 chr11 HiFi end-to-end variant calling on real TPU.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: aligned read megabases processed per second for the full `call`
pipeline (BAM -> digars -> candidates -> phasing -> noisy-region
re-assembly with device alignment kernels -> VCF), measured as the WARM
MEAN of the tool's best configuration on this machine.  Configurations
(all asserted to emit identical records, modulo the arbitrary per-block
phase orientation where window size differs):

  * device_forced: one 500 kb window stream in-process with
    device_min_cells=500000, so the TPU carries the MAJORITY of alignment
    DP cells (the round-3 review's top item: the chip must carry the
    dominant hot loop, /root/reference/src/align.c:374-460, in a measured
    production run).
  * device_auto:   same stream with the routing threshold auto-calibrated
    from the measured link latency (ops/wfa.py:calibrate_min_cells) — on
    a co-located chip this routes most cells to the device on its own; on
    this image's high-latency tunneled chip it keeps them on the host C
    ladder, and the forced config above shows what the chip does when it
    is made to carry them anyway.
  * procs:         50 kb windows over -t 4 worker processes (the kt_for
    analog, core/procpool.py); host stages scale past the GIL, device
    idle by contract.
  * host_1t:       single-thread host-only — not a headline candidate;
    it is the measured anchor for the C-baseline bracket below.

The detail block carries the audit trail: per-config warm walls (mean AND
best), the aligned-DP-cell split (device / host C / memo) with dispatch
counts and host->device bytes, kernel microbenches (forward, traceback,
and the full production submit/collect path) in DP cells/s against stated
v5e speed-of-light bounds, and the C-baseline bracket derivation.

vs_baseline: longcallD itself cannot be built in this image (its
htslib/abPOA/WFA2-lib submodule sources are absent from the snapshot,
SURVEY.md section 6), so the baseline is a DERIVED bracket anchored to
in-image measurements instead of a wall-clock guess: this pipeline
executes the identical algorithm with C inner loops for the dominant
work, so its measured 1-thread wall brackets the reference's 1-thread
wall within [0.8x, 1.6x] (high/low = 2.0, the round-4 review's
"narrower bracket" bar; fast end 0.8x = granting the reference the
ENTIRE measured Python-glue share of our wall plus alignment parity —
the aligner EXECUTES FEWER DP cells than the reference's WFA2
wavefront model, audited ratio in the bracket detail; slow end 1.6x:
its per-read C loops vs our vectorized passes, capped below round 4's
2x to stay conservative toward it),
scaled by a WORKLOAD-AWARE thread credit: the reference's only
parallel loop is kt_for over fixed 500 kb chunks
(/root/reference/src/call_var_main.c:773), so its speedup on a given
workload is bounded by total bp over the busiest chunk's bp — on this
BAM (one busy 500 kb chunk) that bound is ~1x, a real architectural
limit this pipeline's 50 kb windows + range pool do not share.  The
headline ratio uses the bracket's geometric midpoint; low/high bounds
are published alongside, and the reference's own exit-line measurement
hook (/root/reference/src/call_var_main.c:1030) replaces this bracket
the moment the tool can be built.
"""

import io
import json
import os
import subprocess
import sys
import time

REF = "/root/reference/test_data/chr11_2M.fa"
BAM = "/root/reference/test_data/HG002_chr11_hifi_test.bam"


def _probe_device(timeout_s: float = 0.0):
    """The tunneled TPU backend can wedge (observed: ``jax.devices()``
    blocking indefinitely; a healthy-but-recovering tunnel was measured
    at 160 s for the FIRST eager op, init included).  Probe it in a
    subprocess with a hard timeout BEFORE this process imports jax; on
    failure the caller pins JAX_PLATFORMS=cpu so the bench degrades to a
    host-only measurement instead of hanging the round.

    Returns (ok, status): status distinguishes an intentional caller cpu
    pin from a real probe failure, and carries the probe's stderr tail on
    non-timeout failures so a non-tunnel cause (import error, OOM) is
    diagnosable from the bench artifact."""
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return False, "cpu pinned by caller (JAX_PLATFORMS=cpu) - no probe run"
    if not timeout_s:
        timeout_s = float(os.environ.get(
            "LONGCALLD_BENCH_PROBE_TIMEOUT", "420"))
    code = ("import jax, numpy as np; x = jax.numpy.zeros((8, 128)); "
            "np.asarray(x + 1); print('PLAT', jax.devices()[0].platform)")
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             timeout=timeout_s, capture_output=True,
                             text=True)
        if out.returncode != 0:
            tail = (out.stderr or "").strip().splitlines()[-3:]
            return False, ("probe subprocess failed (rc="
                           f"{out.returncode}): {' | '.join(tail)}")
        if "PLAT cpu" in out.stdout:
            return False, "probe saw only a cpu backend (no TPU visible)"
        return True, "ok"
    except subprocess.TimeoutExpired:
        return False, (f"probe timed out after {timeout_s:.0f}s "
                       "(tunnel unresponsive)")
    except OSError as e:
        return False, f"probe could not launch: {e}"


def _body(vcf: str):
    return [ln for ln in vcf.splitlines() if not ln.startswith("##")]


def _canon(body):
    """Canonicalize the arbitrary per-block phase orientation (the EM seed
    read differs between window sizes, so whole PS blocks may be globally
    flipped 0|1 <-> 1|0 — both orientations are equally correct; block-
    internal consistency is locked separately by tests/test_stitch_fuzz.py).
    Flips every block so its first phased record reads 0|1."""
    flip = {}
    out = []
    for ln in body:
        if ln.startswith("#"):
            out.append(ln)
            continue
        f = ln.split("\t")
        keys = f[8].split(":")
        vals = f[9].split(":")
        d = dict(zip(keys, vals))
        gt = d.get("GT", "")
        if "PS" in d and "|" in gt:
            ps = d["PS"]
            if ps not in flip:
                a0, b0 = gt.split("|")
                flip[ps] = int(a0) > int(b0)
            if flip[ps]:
                a, b = gt.split("|")
                d["GT"] = f"{b}|{a}"
                f[9] = ":".join(d[k] for k in keys)
        out.append("\t".join(f))
    return out


def _kernel_microbench():
    """Kernel throughput in DP cells/s on the real chip, three levels:

    * forward: the Pallas banded-DP kernel alone, N invocations chained by
      a true data dependency under one jit (per-dispatch wall timing over
      the tunneled link reports sub-compute times, so it is not used).
    * traceback: the Pallas walk kernel alone, chained the same way.
    * full_path: the production BatchAligner submit/collect on a batch of
      realistic 1%-divergent pairs — includes input staging, both kernels,
      event compaction, the (latency-bound) transfers, and host decode.
      Its cells are the pattern x text products the routing accounting
      uses, so this rate is directly comparable to the host C ladder's.

    Speed-of-light statement for the forward kernel (v5e, B=2048):
    * HBM bound: 1 traceback byte per cell => 819e9 cells/s at ~819 GB/s.
    * VPU bound, stated two ways: the OPTIMISTIC count of the recurrence's
      irreducible ops is ~85 (batch, B) plane ops per row => ~4.5e10
      cells/s at 8x128 lanes x ~0.94 GHz x 4 ALUs ~= 3.85e12 lane-ops/s;
      the HONEST audit of the kernel as written is ~120 issue slots per
      row (44 for the two log2(B)-step insertion prefix-min ladders — a
      lane-wise scan has no cheaper TPU formulation — 12 diagonal argmin,
      ~14 D/open-extend, ~10 substitution/validity, ~9 traceback pack,
      ~6 adjacency, shifts/rolls/stores for the rest) => ~3.2e10.  The
      binding bound is min(HBM, VPU)."""
    from longcalld_tpu.utils.device import init_device
    init_device()                      # persistent compile cache
    import jax
    import numpy as np

    if jax.devices()[0].platform == "cpu":
        return None
    from longcalld_tpu.ops import pallas_band

    rng = np.random.default_rng(0)
    batch, B, Lp = 64, 2048, 2000
    assert pallas_band.vmem_fits(max(8, (131072 // B) // 8 * 8), B, Lp)
    P0 = jax.numpy.asarray(rng.integers(0, 4, (batch, Lp)).astype(np.int32))
    T = jax.numpy.asarray(rng.integers(0, 4, (batch, Lp + B + 512))
                          .astype(np.int8))
    plen = jax.numpy.full((batch,), Lp, jax.numpy.int32)
    tlen = jax.numpy.full((batch,), Lp, jax.numpy.int32)
    dlo = jax.numpy.full((batch,), -B // 2, jax.numpy.int32)
    kw = dict(B=B, Lp=Lp, x=6, o1=6, e1=2, o2=24, e2=1)
    N = 8
    cells = batch * (Lp + 1) * B

    @jax.jit
    def chained(P):
        def body(Pc, _):
            _tbs, fin, edge = pallas_band.banded_dp_pallas(
                Pc, T, plen, tlen, dlo, **kw)
            return (Pc + edge[:, None]) % 4, fin[0, 0]
        _Pf, fs = jax.lax.scan(body, P, None, length=N)
        return fs

    np.asarray(chained(P0))                      # compile + first run
    fwd_per = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(P0))
        fwd_per = min(fwd_per, (time.perf_counter() - t0) / N)

    tbs, fin, _edge = jax.block_until_ready(
        pallas_band.banded_dp_pallas(P0, T, plen, tlen, dlo, **kw))

    @jax.jit
    def tb_chained(tbs_a, f0):
        def body(fc, _):
            packed, _b0 = pallas_band.backward_resolve_pallas(
                tbs_a, plen, tlen, dlo, fc, B, Lp)
            return fc + packed[0, 0] * 0, packed[0, 0]
        _f, xs = jax.lax.scan(body, f0, None, length=N)
        return xs

    np.asarray(tb_chained(tbs, fin))
    tb_per = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(tb_chained(tbs, fin))
        tb_per = min(tb_per, (time.perf_counter() - t0) / N)

    # full production path: submit/collect through BatchAligner on 64
    # realistic 1%-divergent 2000 bp pairs (cells = pattern x text product,
    # the same accounting the routing split uses)
    from longcalld_tpu.ops.wfa import BatchAligner
    al = BatchAligner(use_device=True, device_min_cells=1)
    pairs = []
    for k in range(64):
        p = rng.integers(0, 4, 2000).astype(np.uint8)
        t = p.copy()
        mut = rng.choice(2000, 20, replace=False)
        t[mut] = (t[mut] + 1) % 4
        pairs.append((p, t))
    al.align_many(pairs)                         # compile + warm
    full_per = 9e9
    for _ in range(3):
        al.memo_clear()
        t0 = time.perf_counter()
        al.align_many(pairs)
        full_per = min(full_per, time.perf_counter() - t0)
    full_cells = sum(len(p) * len(t) for p, t in pairs)

    sol_stated = min(819e9, 4.5e10)
    sol_audited = min(819e9, 3.2e10)
    return {
        "batch": batch, "band_B": B, "rows_Lp": Lp,
        "rows_per_grid_step": pallas_band.ROWS_PER_STEP,
        "dp_cells_per_dispatch": cells,
        "forward": {
            "wall_s_per_call": round(fwd_per, 5),
            "cells_per_s": round(cells / fwd_per, 1),
            "fraction_of_stated_sol": round(cells / fwd_per / sol_stated, 4),
            "fraction_of_audited_sol": round(cells / fwd_per / sol_audited,
                                             4),
        },
        "traceback": {
            "wall_s_per_call": round(tb_per, 5),
            "cells_per_s": round(cells / tb_per, 1),
        },
        "full_path": {
            "wall_s_per_batch": round(full_per, 5),
            "pairs": len(pairs),
            "product_cells_per_s": round(full_cells / full_per, 1),
            "note": "includes staging, fwd+tb kernels, event compaction, "
                    "tunneled transfers, host decode; product cells "
                    "(pattern x text), comparable to the host C ladder "
                    "rate in the routing calibration.  Measured "
                    "decomposition of one 64-pair round on this link "
                    "(2026-08-20): staging 0.6 ms, host->device input "
                    "copy ~34 ms (~700 KB at the tunnel's ~20 MB/s), "
                    "kernels+compaction ~35 ms — the input transfer is "
                    "~half the round, so a persistent-buffer scheme "
                    "cannot close the kernel/full-path gap here: the "
                    "input bytes are new every round",
        },
        "speed_of_light_cells_per_s": {"stated": sol_stated,
                                       "audited": sol_audited},
        "sol_note": "min(HBM-write 819e9, VPU) cells/s; VPU stated with "
                    "an optimistic ~85 plane-ops/row recurrence count "
                    "(4.5e10) and an honest ~120 issue-slots/row audit of "
                    "the kernel as written (3.2e10) — the 2x log2(B) "
                    "prefix-min ladders (44 ops) are irreducible for a "
                    "lane-wise scan on this ISA.  int16 state packing "
                    "(2x lane density) attempted and refuted: Mosaic on "
                    "this backend has no sub-32-bit lowering for min "
                    "(arith.minsi), compares, or rotates — transcripts in "
                    "ops/pallas_band.py's header",
    }


def _vm_hwm_mb(pid: int):
    try:
        with open(f"/proc/{pid}/status") as fh:
            for ln in fh:
                if ln.startswith("VmHWM:"):
                    return int(ln.split()[1]) / 1024.0
    except OSError:
        return None
    return None


def _f1_leg():
    """Truth-set F1 + peak-RSS evidence on a 20 Mb synthetic diploid
    contig (review items 7 and 9): real chr11 sequence tiled to 20 Mb,
    planted SNV/indel/SV truth at human-ish densities, ~20x 12 kb
    HiFi-like reads, full pipeline via the process pool, scored with
    left-normalized matching (tests/synthcontig.py).  Peak RSS is read
    from VmHWM of the main process and every pool worker — the
    reference's published anchor is ~1 GB/thread
    (/root/reference/README.md:187)."""
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    import numpy as np
    from fnclassify import classify_fn_causes
    from synthcontig import (build_truth, evaluate_f1, write_synth_bam,
                             write_synth_fasta)

    from longcalld_tpu.config import CallOpts
    from longcalld_tpu.core.pipeline import _open_aln, run_call
    from longcalld_tpu.io.fasta import FastaFile

    fa = FastaFile(REF)
    base = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    base = np.where(base > 3, 0, base).astype(np.uint8)
    ref4 = np.concatenate([base] * 10)             # 20 Mb
    rng = np.random.default_rng(7)
    beg, end = 10_000, len(ref4) - 10_000
    truth = build_truth(rng, ref4, beg, end)
    with tempfile.TemporaryDirectory() as d:
        write_synth_fasta(d + "/synth.fa", "chr21", ref4)
        t0 = time.time()
        n_reads = write_synth_bam(d + "/synth.bam", "chr21", len(ref4),
                                  ref4, truth, beg, end, coverage=20,
                                  read_len=12_000, err=0.003, seed=1)
        gen_s = time.time() - t0
        opt = CallOpts.hifi(ref_fa_fn=d + "/synth.fa",
                            in_bam_fns=[d + "/synth.bam"],
                            use_device=False, n_threads=4)
        t0 = time.time()
        buf = io.StringIO()
        run_call(opt, buf, "bench-f1")
        wall = time.time() - t0
        body = [ln for ln in buf.getvalue().splitlines()
                if not ln.startswith("#")]
        f1, fns = evaluate_f1(body, truth, beg, end, ref4, return_fns=True)
        # every FN bucketed by pipeline cause (round-4 review item 4);
        # windows containing FNs are re-run once each
        t0 = time.time()
        fn_causes = classify_fn_causes(
            opt, FastaFile(d + "/synth.fa"),
            [_open_aln(d + "/synth.bam", d + "/synth.fa")], fns, "chr21",
            len(ref4))
        fn_causes["classify_wall_s"] = round(time.time() - t0, 1)
        fn_causes["note"] = (
            "dropped_in_noisy_reassembly = truth inside a noisy region the "
            "pipeline skipped or whose consensus missed it; regions larger "
            "than max_noisy_reg_len (50 kb) are skipped whole exactly like "
            "the reference (collect_var.c:2653, call_var_main.h:42) after "
            "classification already dropped their contained candidates "
            "(collect_var.c:902-1045) — on this contig the subtelomeric "
            "low-complexity head chains one >50 kb region via the "
            "min-label dynamic merge (cgranges.c:248-255)")
    from longcalld_tpu.core import procpool
    worker_rss = []
    with procpool._LOCK:
        for pool in procpool._POOLS.values():
            for w in pool:
                v = _vm_hwm_mb(w.proc.pid)
                if v is not None:
                    worker_rss.append(round(v, 1))
    main_rss = _vm_hwm_mb(os.getpid())
    mbp = n_reads * 12_000 / 1e6
    return {
        "contig_mb": round(len(ref4) / 1e6, 1),
        "n_truth": len(truth),
        "n_reads": n_reads,
        "aligned_mbp": round(mbp, 1),
        "gen_s": round(gen_s, 1),
        "call_wall_s": round(wall, 1),
        "mbp_per_s": round(mbp / wall, 2),
        "f1": f1,
        "fn_causes": fn_causes,
        "peak_rss_mb": {
            "main": round(main_rss, 1) if main_rss else None,
            "workers": worker_rss,
            "reference_anchor": "~1 GB/thread HiFi WGS "
                                "(/root/reference/README.md:187)",
        },
    }


def _wgs_leg():
    """Whole-genome-scale streaming evidence (round-4 review item 9):
    tile the synthetic diploid to 100 Mb (+ a read-free 100 Mb contig for
    index-skip accounting), run the FULL procs pipeline with
    checkpointing ON, and report sustained Mbp/s, peak RSS per process
    against the reference's ~1 GB/thread anchor
    (/root/reference/README.md:187), and window-skip efficiency.  Then
    verify resume-from-kill ONCE at scale: a subprocess running the same
    checkpointed call is SIGKILLed mid-run and the in-process resume
    must complete with byte-identical output."""
    import shutil
    import signal
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    import numpy as np
    from synthcontig import build_truth, write_synth_bam, write_synth_fasta

    from longcalld_tpu.config import CallOpts
    from longcalld_tpu.core import procpool
    from longcalld_tpu.core.pipeline import run_call
    from longcalld_tpu.io.fasta import FastaFile
    from longcalld_tpu.utils import counters

    fa = FastaFile(REF)
    base = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    base = np.where(base > 3, 0, base).astype(np.uint8)
    ref4 = np.concatenate([base] * 50)             # 100 Mb
    rng = np.random.default_rng(21)
    beg, end = 10_000, len(ref4) - 10_000
    truth = build_truth(rng, ref4, beg, end)
    d = tempfile.mkdtemp(prefix="wgs_bench_")
    try:
        t0 = time.time()
        write_synth_fasta(d + "/wgs.fa", ["chr21", "chr22"], [ref4, ref4])
        n_reads = write_synth_bam(d + "/wgs.bam", "chr21", len(ref4),
                                  ref4, truth, beg, end, coverage=15,
                                  read_len=12_000, err=0.003, seed=3,
                                  extra_refs=[("chr22", len(ref4))])
        gen_s = time.time() - t0
        mbp = n_reads * 12_000 / 1e6

        # the measured call runs in its OWN subprocess so peak RSS is the
        # pipeline's, not the in-process 100 Mb data generator's; the
        # child reports wall/worker-RSS/counters as JSON and writes the
        # VCF to a file, and os.wait4 gives its own ru_maxrss
        runner = d + "/wgs_call.py"
        with open(runner, "w") as fh:
            fh.write(
                "import sys, time, json, os\n"
                "sys.path.insert(0, '/root/repo')\n"
                "from longcalld_tpu.config import CallOpts\n"
                "from longcalld_tpu.core.pipeline import run_call\n"
                "from longcalld_tpu.core import procpool\n"
                "from longcalld_tpu.utils import counters\n"
                "def vm_hwm(pid):\n"
                "    try:\n"
                "        for ln in open(f'/proc/{pid}/status'):\n"
                "            if ln.startswith('VmHWM:'):\n"
                "                return int(ln.split()[1]) / 1024.0\n"
                "    except OSError:\n"
                "        return None\n"
                "fa_fn, bam_fn, ck, out_fn = sys.argv[1:5]\n"
                "opt = CallOpts.hifi(ref_fa_fn=fa_fn, in_bam_fns=[bam_fn],"
                " use_device=False, n_threads=4, checkpoint_dir=ck)\n"
                "t0 = time.time()\n"
                "with open(out_fn, 'w') as out:\n"
                "    n_vars = run_call(opt, out, 'bench-wgs')\n"
                "wall = time.time() - t0\n"
                "snap = counters.snapshot()\n"
                "rss = []\n"
                "with procpool._LOCK:\n"
                "    for pool in procpool._POOLS.values():\n"
                "        for w in pool:\n"
                "            v = vm_hwm(w.proc.pid)\n"
                "            if v is not None:\n"
                "                rss.append(round(v, 1))\n"
                "print(json.dumps({'wall': wall, 'n_vars': n_vars,\n"
                "    'worker_rss': rss,\n"
                "    'wins_planned': snap.get('wins_planned', 0),\n"
                "    'wins_skipped': snap.get('wins_skipped_by_index',"
                " 0)}))\n")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.Popen(
            [sys.executable, runner, d + "/wgs.fa", d + "/wgs.bam",
             d + "/ck", d + "/full.vcf"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True)
        # sample the child's VmRSS directly: VmHWM / ru_maxrss of a
        # fork-spawned child are polluted by the fork moment (the child
        # briefly carries this 100 Mb generator process's RSS — measured
        # as a constant ~7.2 GB ghost across otherwise different runs)
        main_rss = 0.0
        while proc.poll() is None:
            try:
                for ln in open(f"/proc/{proc.pid}/status"):
                    if ln.startswith("VmRSS:"):
                        main_rss = max(main_rss,
                                       int(ln.split()[1]) / 1024.0)
                        break
            except OSError:
                break
            time.sleep(0.2)
        child_out = proc.stdout.read()
        proc.wait()
        lines = child_out.strip().splitlines()
        if not lines:
            raise RuntimeError(
                f"WGS call subprocess produced no report (rc="
                f"{proc.returncode}) — likely died mid-run")
        rep = json.loads(lines[-1])
        wall = rep["wall"]
        with open(d + "/full.vcf") as fh:
            vcf_full = fh.read()

        # resume-from-kill at scale: SIGKILL a fresh checkpointed run at
        # ~60% of the measured wall (late enough that a prefix of windows
        # is durably checkpointed), then resume in-process, byte-compare
        ck2 = d + "/ck2"
        proc = subprocess.Popen(
            [sys.executable, runner, d + "/wgs.fa", d + "/wgs.bam",
             ck2, d + "/killed.vcf"],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        # never past the measured wall (a kill after completion would make
        # the resume evidence vacuous while still reporting byte-identical)
        kill_after = min(max(5.0, 0.6 * wall), 0.9 * wall)
        time.sleep(kill_after)
        killed_while_running = proc.poll() is None
        proc.send_signal(signal.SIGKILL)
        proc.wait()
        n_ck2 = sum(1 for f in os.listdir(ck2)
                    if f.startswith("win_")) if os.path.isdir(ck2) else 0
        opt = CallOpts.hifi(ref_fa_fn=d + "/wgs.fa",
                            in_bam_fns=[d + "/wgs.bam"],
                            use_device=False, n_threads=4,
                            checkpoint_dir=ck2)
        t0 = time.time()
        buf2 = io.StringIO()
        run_call(opt, buf2, "bench-wgs")
        resume_wall = time.time() - t0
        resume_ok = _body(buf2.getvalue()) == _body(vcf_full)
        return {
            "contig_mb": round(len(ref4) / 1e6, 1),
            "read_free_contig_mb": round(len(ref4) / 1e6, 1),
            "n_reads": n_reads,
            "aligned_mbp": round(mbp, 1),
            "gen_s": round(gen_s, 1),
            "call_wall_s": round(wall, 1),
            "sustained_mbp_per_s": round(mbp / wall, 2),
            "n_vars": rep["n_vars"],
            "checkpointing": "on (procs path, per-window npz)",
            "window_skip": {
                "planned": int(rep["wins_planned"]),
                "skipped_by_index": int(rep["wins_skipped"]),
                "note": "the read-free chr22 copy plus edge windows are "
                        "proven empty from the BAI without touching data",
            },
            "peak_rss_mb": {
                "main": round(main_rss, 1),
                "workers": rep["worker_rss"],
                "reference_anchor": "~1 GB/thread HiFi WGS "
                                    "(/root/reference/README.md:187)",
            },
            "resume_from_kill": {
                "killed_after_s": round(kill_after, 1),
                "killed_while_running": bool(killed_while_running),
                "windows_checkpointed_at_kill": n_ck2,
                "resume_wall_s": round(resume_wall, 1),
                "byte_identical": bool(resume_ok),
            },
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    device_ok, device_status = _probe_device()
    if not device_ok:
        os.environ["JAX_PLATFORMS"] = "cpu"
        print(f"host-only run: {device_status}", file=sys.stderr)
    from longcalld_tpu.config import CallOpts
    from longcalld_tpu.core.pipeline import run_call
    from longcalld_tpu.io.bam import BamReader
    from longcalld_tpu.ops import wfa as _wfa

    bam = BamReader(BAM)
    tid = bam.name2tid("chr11")
    total_bp = sum(r.l_seq for r in bam.fetch(tid, 0, 2_000_000))
    mbp = total_bp / 1e6

    def clear_memos():
        # compiled executables staying warm is real steady-state, but
        # reusing a previous pass's alignment RESULTS on identical reads
        # would not happen on fresh genomic windows
        for al in _wfa._ALIGNER_CACHE.values():
            al.memo_clear()

    def timed_runs(opt, n):
        walls, bodies = [], []
        before = _wfa.aligner_totals()
        for _ in range(n):
            clear_memos()
            buf = io.StringIO()
            t0 = time.time()
            run_call(opt, buf, "bench")
            walls.append(time.time() - t0)
            bodies.append(_body(buf.getvalue()))
        after = _wfa.aligner_totals()
        cells = {k: after[k] - before[k] for k in after}
        return walls, bodies, cells

    # --- config A: device, auto-calibrated routing (500 kb, in-process) --
    # ONE cold + one warm pass only: with auto-routing keeping cells on
    # the host C ladder over this link, its timed passes measured the
    # same code as the host configs but single-process (round-4 review
    # weakness 3: dead weight) — it stays as the routing-correctness
    # anchor (auto VCF == forced VCF) and the cold-compile datum, not a
    # headline candidate.
    opt_auto = CallOpts.hifi(ref_fa_fn=REF, in_bam_fns=[BAM])
    t0 = time.time()
    buf = io.StringIO()
    n_vars = run_call(opt_auto, buf, "bench")   # cold: lowering + load
    wall_cold = time.time() - t0
    body_ref = _body(buf.getvalue())
    auto_walls, auto_bodies, auto_cells = timed_runs(opt_auto, 1)
    assert all(b == body_ref for b in auto_bodies)  # same config: byte-equal

    # --- config B: device FORCED to carry the alignment work -------------
    # (device_min_cells=500k, exactly as the multichip dryrun's window-
    # sharding leg; the review's "done" bar: cells_device > cells_host in a
    # measured production run)
    opt_forced = CallOpts.hifi(ref_fa_fn=REF, in_bam_fns=[BAM],
                               device_min_cells=500_000)
    run_call(opt_forced, io.StringIO(), "bench")   # warm forced shapes
    for al in _wfa._ALIGNER_CACHE.values():
        al.round_log.clear()
    forced_walls, forced_bodies, forced_cells = timed_runs(opt_forced, 3)
    assert all(b == body_ref for b in forced_bodies), \
        "forced-device VCF diverged from auto-routing VCF"
    # round-by-round latency budget of the device chain (review item 1):
    # every submit->collect round with its pair/group counts, bytes and
    # wall; the chain is 3 fused rounds per pass after the per-hap MSA +
    # gap-convention fusion (was 9 rounds/pass in round 4)
    round_entries = []
    for al in _wfa._ALIGNER_CACHE.values():
        round_entries.extend(al.round_log)
    n_passes = 3
    round_budget = {
        "rounds_per_pass": round(len(round_entries) / n_passes, 2),
        "sum_round_wall_s_per_pass": round(
            sum(e["round_s"] for e in round_entries) / n_passes, 4),
        "rounds": [{k: e[k] for k in ("n_pairs", "n_groups", "round_s",
                                      "submit_s", "bytes_h2d")}
                   for e in round_entries[:12]],
        "note": "submit->collect wall per fused device round (all regions "
                "of a window batched; both per-hap MSAs and both gap "
                "conventions share rounds).  The device chain now costs "
                "~0.15 s/pass of a ~1.2 s wall — the forced config's "
                "residual vs the host configs is the GIL-bound "
                "single-process host stages (measured ~1.0 s at one "
                "thread), no longer the link round-trip chain",
    }

    # --- config C: process-parallel windows (50 kb, -t 4, host-only) -----
    opt_procs = CallOpts.hifi(ref_fa_fn=REF, in_bam_fns=[BAM],
                              window_size=50_000, n_threads=4)
    run_call(opt_procs, io.StringIO(), "bench")   # warm pool + shapes
    from longcalld_tpu.utils import counters as _counters
    _counters.reset()                 # cell audit = the timed passes only
    # 6 passes: at ~0.3 s each the procs config is cheap to sample,
    # and the box's ~1.3x speed phases otherwise make the recorded
    # headline a coin flip between passes
    procs_walls, procs_bodies, _ = timed_runs(opt_procs, 6)
    # identical modulo the arbitrary per-block phase orientation (window
    # size changes the EM seed read); procs-vs-sequential byte identity at
    # equal window size is locked by tests/test_procs.py
    canon_ref = _canon(body_ref)
    assert all(_canon(b) == canon_ref for b in procs_bodies), \
        "procs VCF diverged from device-path VCF"
    # worker-side cell routing is aggregated into utils.counters;
    # per-worker attribution keys end in _w<digit>
    import re as _re
    procs_cells = {k[4:]: v for k, v in _counters.snapshot().items()
                   if k.startswith("aln_")
                   and not _re.search(r"_w\d+$", k)}

    # --- anchor D: single-thread host-only (baseline bracket input) ------
    opt_1t = CallOpts.hifi(ref_fa_fn=REF, in_bam_fns=[BAM], n_threads=1,
                           host_procs=0, use_device=False)
    run_call(opt_1t, io.StringIO(), "bench")
    host1_walls, host1_bodies, host1_cells = timed_runs(opt_1t, 2)
    assert all(b == body_ref for b in host1_bodies)

    kern = _kernel_microbench()
    f1 = (None if os.environ.get("LONGCALLD_BENCH_F1") == "0"
          else _f1_leg())
    wgs = (None if os.environ.get("LONGCALLD_BENCH_WGS") == "0"
           else _wgs_leg())

    def stats(walls):
        return {"mean_s": round(sum(walls) / len(walls), 3),
                "best_s": round(min(walls), 3),
                "all_s": [round(w, 2) for w in walls]}

    auto_stats = stats(auto_walls)
    forced_stats = stats(forced_walls)
    procs_stats = stats(procs_walls)
    host1_stats = stats(host1_walls)
    # headline candidates: the forced-device stream and the process pool
    # (the auto config is a correctness/cold anchor only, see config A)
    configs = {"device_forced_500kb": forced_stats,
               "procs_50kb_t4": procs_stats}
    best_cfg = min(configs, key=lambda c: configs[c]["mean_s"])
    headline_mean = configs[best_cfg]["mean_s"]
    mbp_s = mbp / headline_mean

    # --- C-baseline bracket, anchored to the measured 1-thread wall ------
    # This pipeline executes the reference's algorithm with C inner loops
    # for the hot work, so its measured single-thread wall brackets the
    # reference's; the bracket bounds and their evidence are in the
    # round-5 note just below.  Thread scaling credited between our own
    # measured procs speedup and 3x (its 8 default workers on this 4-core
    # host).  vs_baseline uses the bracket's geometric midpoint.
    #
    # Thread-scaling credit is WORKLOAD-AWARE: the reference's only
    # parallelism is kt_for over fixed 500 kb chunks
    # (/root/reference/src/call_var_main.c:773, chunk size
    # /root/reference/src/bam_utils.h:10; verified — there is no
    # finer-grained parallel loop in its stage 0/1), so on any given
    # workload its speedup is bounded by total aligned bp over the
    # busiest chunk's bp (Amdahl over chunks).  On this bench's BAM
    # nearly every read falls in ONE 500 kb chunk, so the reference
    # cannot scale here at all — while this pipeline's 50 kb windows +
    # range pool can, a real architectural difference, not a tuning
    # artifact.  The fast end still credits the reference the full
    # min(3x, chunk-parallelism); the slow end credits none.
    t1 = host1_stats["mean_s"]
    my_thread_speedup = min(3.0, max(1.0, t1 / procs_stats["mean_s"]))
    bin_bp: dict = {}
    for r in bam.fetch(tid, 0, 2_000_000):
        bin_bp[r.pos // 500_000] = bin_bp.get(r.pos // 500_000, 0) \
            + r.l_seq
    ref_chunk_par = (total_bp / max(bin_bp.values())) if bin_bp else 1.0
    ref_scale_high = min(3.0, ref_chunk_par)
    # Round-5 bracket: [0.8x, 1.6x] of our 1-thread wall (high/low = 2.0,
    # the round-4 review's "narrower bracket" bar; was [0.75x, 2x]).
    # Fast end 0.8x (the reference at most 1.25x faster single-threaded):
    # granting it the ENTIRE measured Python-glue share of our wall
    # (~0.2 s of coroutine/orchestration machinery out of ~1.0 s — the
    # one place its C glue is structurally leaner) plus alignment parity
    # (it executes 1.5x our audited DP cells — exec_over_wf_model below —
    # against a granted <=2x SIMD per-cell edge) lands exactly at 0.8x;
    # everything else is mandatory shared work at comparable constants
    # (same zlib inflate of the same BGZF bytes, same per-base digar
    # scan shape, same pileup joins — ours C/vectorized, its per-read C).
    # Slow end 1.6x (at most 1.6x slower): our C-vs-scalar microbenches
    # show 1.3-3x vectorization wins on the join/scan stages, but the
    # reference's per-read C loops are not pathological; crediting it no
    # worse than 1.6x is more conservative toward it than round 4's 2x.
    base_low = mbp / (t1 * 1.6)                        # ref slow end
    base_high = mbp / (t1 * 0.8 / ref_scale_high)      # ref fast end
    base_mid = (base_low * base_high) ** 0.5
    n_w = max(len(host1_walls), 1)
    wf_model = host1_cells.get("model_wf_cells", 0) / n_w
    poa_model = host1_cells.get("model_poa_cells", 0) / n_w
    cells_exec = (host1_cells.get("cells_host_band_exec", 0)
                  + host1_cells.get("cells_host_full_exec", 0)
                  + host1_cells.get("cells_host_greedy_exec", 0)) / n_w
    baseline_bracket = {
        "low_mbp_s": round(base_low, 3),
        "mid_mbp_s": round(base_mid, 3),
        "high_mbp_s": round(base_high, 3),
        "anchor_1t_wall_s": t1,
        "my_thread_speedup": round(my_thread_speedup, 2),
        "ref_chunk_parallelism": round(ref_chunk_par, 3),
        "ref_scale_credit_high": round(ref_scale_high, 3),
        "scale_note": "the reference's only parallel loop is kt_for "
                      "over 500 kb chunks (call_var_main.c:773, "
                      "bam_utils.h:10), so its thread speedup on THIS "
                      "workload is bounded by total bp / busiest-chunk "
                      "bp; this pipeline's 50 kb windows + range pool "
                      "are not so bounded (my_thread_speedup above is "
                      "its measured value here)",
        "ref_wavefront_model_cells": int(wf_model),
        "ref_poa_band_model_cells": int(poa_model),
        "cells_executed": int(cells_exec),
        "exec_over_wf_model": round(cells_exec / max(wf_model, 1), 3),
        "model_note": "per-run reference alignment-volume models from "
                      "our own pair results: WFA2 ~5*s^2 cells/pair, "
                      "abPOA ~n*m/10 band cells/pair.  cells_executed is "
                      "the C layer's audited actually-run DP work "
                      "(banded rows x width + full planes + greedy "
                      "prepass); exec_over_wf_model < 1 means this "
                      "aligner runs FEWER cells than the reference's "
                      "wavefronts would — part of the measured basis "
                      "for the 0.8x fast end",
    }
    baseline_mid = base_mid

    if device_ok and forced_cells.get("cells_device", 0) >= 0:
        assert (forced_cells["cells_device"]
                > forced_cells["cells_host"]), (
            "forced-device config did not put the majority of DP cells "
            f"on the device: {forced_cells}")

    print(f"cold: {wall_cold:.1f}s  auto: {auto_stats}  "
          f"forced: {forced_stats}  procs: {procs_stats}  "
          f"host1t: {host1_stats}  vars: {n_vars}  aligned: {mbp:.2f} Mbp",
          file=sys.stderr)
    print(json.dumps({
        "metric": "hg002_chr11_hifi_e2e_throughput",
        "value": round(mbp_s, 3),
        "unit": "Mbp/s",
        "vs_baseline": round(mbp_s / baseline_mid, 3),
        "detail": {
            "headline": "warm MEAN of best config; all configs emit "
                        "identical records (procs modulo per-block phase "
                        "orientation)",
            "best_config": best_cfg,
            "device_status": device_status,
            "wall_cold_s": round(wall_cold, 1),
            "config_device_auto_500kb": {
                **auto_stats,
                "aligned_dp_cells": auto_cells,
            },
            "config_device_forced_500kb": {
                **forced_stats,
                "aligned_dp_cells": forced_cells,
                "device_round_budget": round_budget,
                "note": "device_min_cells=500000: the TPU carries the "
                        "majority of alignment DP cells "
                        "(cells_device > cells_host asserted below)",
            },
            "config_procs_50kb_t4": {
                **procs_stats,
                "aligned_dp_cells": procs_cells,
            },
            "anchor_host_1t_500kb": host1_stats,
            "kernels": kern,
            "f1_synth_20mb": f1,
            "wgs_100mb_streaming": wgs,
            "n_vars": n_vars,
            "aligned_mbp": round(mbp, 2),
            "baseline_bracket_mbp_s": baseline_bracket,
            "baseline_note": "bracket derived from the measured 1-thread "
                             "host-only wall of this pipeline (same "
                             "algorithm, C inner loops for the dominant "
                             "work): reference 1-thread wall bracketed "
                             "at [0.8x, 1.6x] of ours (derivation in "
                             "the source comments), thread-scaling "
                             "credit between 1x and min(3x, its "
                             "measured chunk-level parallelism bound on "
                             "this workload — its only parallel loop is "
                             "kt_for over 500 kb chunks); vs_baseline = "
                             "headline / geometric midpoint.  The fast "
                             "end is evidenced by the audited "
                             "executed-vs-wavefront-model cell ratio "
                             "inside baseline_bracket_mbp_s (this "
                             "aligner now runs FEWER DP cells than the "
                             "reference's WFA2 wavefront volume).  "
                             "longcallD is unbuildable in-image "
                             "(submodule sources absent).",
        },
    }))


if __name__ == "__main__":
    main()
