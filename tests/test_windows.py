"""Window planner: contig filtering, BED formats, window cutting
(collect_regions / classify_chromosome, call_var_main.c:411-634)."""

import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.windows import plan_windows, skip_target

REFS = ["chr1", "chr2", "chrX", "chrY", "chrM", "hs37d5", "chr11_random"]
LENS = [1_200_000, 900_000, 800_000, 300_000, 16_000, 40_000, 10_000]


def test_contig_filters():
    opt = CallOpts.hifi()                     # default: autosome + XY
    assert not skip_target(opt, "chr1")
    assert not skip_target(opt, "chrX")
    assert skip_target(opt, "chrM")
    assert skip_target(opt, "hs37d5")
    opt_a = CallOpts.hifi(only_autosome=True)
    assert skip_target(opt_a, "chrX")
    opt_all = CallOpts.hifi(only_autosome=False, only_autosome_XY=False)
    assert not skip_target(opt_all, "chrM")
    assert not skip_target(opt_all, "hs37d5")
    opt_exc = CallOpts.hifi(only_autosome=False, only_autosome_XY=False,
                            exc_tnames=("hs37d5",))
    assert skip_target(opt_exc, "hs37d5")


def test_whole_genome_windows_cut_at_window_size():
    opt = CallOpts.hifi(window_size=500_000)
    wins = plan_windows(opt, REFS, LENS)
    chr1 = [w for w in wins if w.tname == "chr1"]
    assert len(chr1) == 3                     # 1.2 Mb -> 500k+500k+200k
    assert (chr1[0].beg, chr1[0].end) == (1, 500_000)
    assert (chr1[2].beg, chr1[2].end) == (1_000_001, 1_200_000)
    # default filter drops chrM / hs37d5 / chr11_random
    assert {w.tname for w in wins} == {"chr1", "chr2", "chrX", "chrY"}
    # each contig is its own stitch chunk
    assert len({w.chunk_i for w in wins if w.tname == "chr1"}) == 1
    assert ({w.chunk_i for w in wins if w.tname == "chr1"}
            != {w.chunk_i for w in wins if w.tname == "chr2"})


def test_bed_file_formats(tmp_path):
    bed = tmp_path / "r.bed"
    bed.write_text("# comment\n"
                   "chr1\n"                       # whole contig
                   "chr2\t100\n"                  # from 101 to end
                   "chrX\t1000\t2000\n"           # explicit
                   "chrUnknown\t1\t2\n")          # skipped
    opt = CallOpts.hifi(reg_bed_fn=str(bed))
    wins = plan_windows(opt, REFS, LENS, max_reg_len=2_000_000)
    spans = {(w.tname, w.beg, w.end) for w in wins}
    assert ("chr1", 1, 1_200_000) in spans
    assert ("chr2", 101, 900_000) in spans
    assert ("chrX", 1001, 2000) in spans
    assert not any(t == "chrUnknown" for t, _, _ in spans)


def test_explicit_regions_override_filters():
    # explicit regions bypass the autosome filter (like the reference's
    # positional regions)
    opt = CallOpts.hifi(regions=["chrM", "chr1:10,001-20,000"])
    wins = plan_windows(opt, REFS, LENS, max_reg_len=2_000_000)
    spans = {(w.tname, w.beg, w.end) for w in wins}
    assert ("chrM", 1, 16_000) in spans
    assert ("chr1", 10_001, 20_000) in spans
