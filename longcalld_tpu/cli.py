"""Command-line interface: `longcalld-tpu call ref.fa in.bam > out.vcf`.

Option surface mirrors the reference CLI (/root/reference/src/call_var_main.c
:907-987) including the two-pass preset handling (--hifi/--ont first, then
overrides).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from typing import List, Optional

from longcalld_tpu.config import CallOpts


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="longcalld-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("call", help="call small + structural variants")
    c.add_argument("ref_fa")
    c.add_argument("bams", nargs="+")
    c.add_argument("--hifi", action="store_true",
                   help="PacBio HiFi preset (default)")
    c.add_argument("--ont", action="store_true", help="ONT preset")
    c.add_argument("-o", "--out-vcf", default=None)
    c.add_argument("-b", "--out-bam", default=None,
                   help="write phased BAM with HP/PS tags")
    c.add_argument("-C", "--out-cram", default=None,
                   help="write phased CRAM with HP/PS tags")
    c.add_argument("--refine-aln", action="store_true")
    c.add_argument("-s", "--mosaic", action="store_true",
                   help="call somatic/mosaic variants")
    c.add_argument("-T", "--te-seqs", default=None,
                   help="TE consensus FASTA for MEI annotation")
    c.add_argument("-r", "--region", action="append", default=[],
                   help="region(s) chr[:beg[-end]]")
    c.add_argument("-R", "--region-file", default=None, help="BED file")
    c.add_argument("-n", "--sample-name", default=None)
    c.add_argument("-t", "--threads", type=int, default=8)
    c.add_argument("-a", "--autosome", action="store_true",
                   help="autosomes only")
    c.add_argument("--autosome-XY", dest="autosome_xy", action="store_true",
                   default=True)
    c.add_argument("-m", "--min-mq", type=int, default=None)
    c.add_argument("-q", "--min-bq", type=int, default=None)
    c.add_argument("-d", "--min-dp", type=int, default=None)
    c.add_argument("-D", "--min-alt-dp", type=int, default=None)
    c.add_argument("--min-af", type=float, default=None)
    c.add_argument("--max-af", type=float, default=None)
    c.add_argument("--no-vcf-header", action="store_true")
    c.add_argument("--amb-base", action="store_true")
    c.add_argument("--read-names", action="store_true",
                   help="output supporting read names (ALTREADS)")
    c.add_argument("--no-device", action="store_true",
                   help="host-only execution (no TPU dispatch)")
    c.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace of the run to DIR "
                        "(view with tensorboard/xprof)")
    c.add_argument("-V", "--verbose", action="count", default=0,
                   help="debug verbosity (repeat: 1 window summaries, "
                        "2 candidate sites, 3 digars)")
    c.add_argument("--shard", default=None, metavar="i/n|auto",
                   help="multi-host: process region chunks with "
                        "chunk %% n == i ('auto' = jax process index)")
    m = sub.add_parser("merge", help="merge per-shard VCFs")
    m.add_argument("vcfs", nargs="+")
    m.add_argument("-o", "--out-vcf", default=None)
    return p


def merge_vcfs(paths: List[str], out) -> int:
    """Concatenate shard VCFs into one position-sorted VCF.  The header is
    taken from the first file; contig rank follows its ##contig order."""
    import gzip as _gzip

    def open_text(p):
        return _gzip.open(p, "rt") if p.endswith(".gz") else open(p)

    header: List[str] = []
    rank: dict = {}
    records = []
    for pi, path in enumerate(paths):
        with open_text(path) as f:
            for line in f:
                line = line.rstrip("\n")
                if line.startswith("#"):
                    if pi == 0:
                        header.append(line)
                        if line.startswith("##contig=<ID="):
                            name = line.split("ID=")[1].split(",")[0] \
                                .rstrip(">")
                            rank[name] = len(rank)
                    continue
                f0 = line.split("\t", 2)
                records.append((rank.get(f0[0], 1 << 30), int(f0[1]), line))
    records.sort(key=lambda r: (r[0], r[1]))
    for line in header:
        out.write(line + "\n")
    for _, _, line in records:
        out.write(line + "\n")
    return len(records)


def opts_from_args(args: argparse.Namespace) -> CallOpts:
    base = CallOpts.ont() if args.ont else CallOpts.hifi()
    overrides = dict(
        ref_fa_fn=args.ref_fa,
        in_bam_fns=args.bams,
        regions=args.region,
        reg_bed_fn=args.region_file,
        sample_name=args.sample_name,
        out_vcf_fn=args.out_vcf,
        out_bam_fn=args.out_cram or args.out_bam,
        out_is_cram=args.out_cram is not None,
        refine_bam=args.refine_aln,
        out_somatic=args.mosaic,
        te_seq_fn=args.te_seqs,
        n_threads=args.threads,
        only_autosome=args.autosome,
        no_vcf_header=args.no_vcf_header,
        out_amb_base=args.amb_base,
        output_var_rnames=args.read_names,
        use_device=not args.no_device,
        shard=args.shard,
    )
    for name, key in (("min_mq", "min_mq"), ("min_bq", "min_bq"),
                      ("min_dp", "min_dp"), ("min_alt_dp", "min_alt_dp"),
                      ("min_af", "min_af"), ("max_af", "max_af")):
        v = getattr(args, name)
        if v is not None:
            overrides[key] = v
    return dataclasses.replace(base, **overrides)


def main(argv: Optional[List[str]] = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    args = build_parser().parse_args(argv)
    from longcalld_tpu.utils import log
    if args.cmd == "call":
        log.set_verbose(args.verbose)
        from longcalld_tpu.core.pipeline import run_call
        opt = opts_from_args(args)
        cmdline = "longcalld-tpu " + " ".join(argv)
        log.info("main", f"Command: {cmdline}")
        profiling = False
        if getattr(args, "profile", None):
            # device+host trace (SURVEY section 5); best-effort — some
            # backends cannot serve the profiler
            try:
                import jax
                jax.profiler.start_trace(args.profile)
                profiling = True
            except Exception as e:
                log.warning("main", f"profiler unavailable: {e}")
        if opt.out_vcf_fn and opt.out_vcf_fn.endswith(".gz"):
            # bgzip-compressed VCF (the reference's -O z mode)
            import io as _io

            from longcalld_tpu.io.bgzf import BgzfWriter

            with open(opt.out_vcf_fn, "wb") as raw:
                w = BgzfWriter(raw, n_threads=opt.n_threads)

                class _Text:
                    def write(self, s: str) -> int:
                        w.write(s.encode())
                        return len(s)

                run_call(opt, _Text(), cmdline)
                w.close()
        elif opt.out_vcf_fn:
            with open(opt.out_vcf_fn, "w") as f:
                run_call(opt, f, cmdline)
        else:
            run_call(opt, sys.stdout, cmdline)
        if profiling:
            try:
                import jax
                jax.profiler.stop_trace()
                log.info("main", f"profiler trace written to {args.profile}")
            except Exception as e:
                log.warning("main", f"profiler stop failed: {e}")
        log.exit_summary()
        return 0
    if args.cmd == "merge":
        if args.out_vcf:
            with open(args.out_vcf, "w") as f:
                merge_vcfs(args.vcfs, f)
        else:
            merge_vcfs(args.vcfs, sys.stdout)
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
