"""Unit tests for the MEI annotation helpers: TSD + polyA/polyT detection
(collect_te_info, align.c:20-162), the TE 15-mer index (kmer.c), and the
cyclic VNTR fuzzy matcher (collect_var.c:120-150)."""

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.align_screen import vntr_fuzzy_comp_seq
from longcalld_tpu.core.kmer import TeKmerIndex
from longcalld_tpu.core.te import NO_TE, collect_te_info
from longcalld_tpu.io.bam import CINS

A, C, G, T = 0, 1, 2, 3


def _s(txt: str) -> np.ndarray:
    return np.array(["ACGT".index(ch) for ch in txt], dtype=np.uint8)


@pytest.fixture
def opt():
    return CallOpts.hifi()


def test_tsd_polya_detected(opt):
    # gap = TSD (8bp, == right flank) + body + 12bp polyA tail
    tsd = "ACGTACGA"
    gap = _s(tsd + "GGCCGGTTAACCGG" + "A" * 12)
    flank = _s(tsd + "TTTTGGGGCCCC")
    info = collect_te_info(opt, CINS, gap, flank, gap_pos=1000)
    assert info.tsd_len == len(tsd)
    assert np.array_equal(info.tsd_seq, _s(tsd))
    assert info.polya_len >= 12
    assert info.tsd_pos1 == 1000


def test_tsd_one_mismatch_allowed(opt):
    tsd = "ACGTACGA"
    gap = list(tsd + "GGCCGGTTAACC" + "A" * 12)
    gap[3] = "C" if tsd[3] != "C" else "G"      # one mismatch inside TSD
    info = collect_te_info(opt, CINS, _s("".join(gap)),
                           _s(tsd + "TTTTGGGG"), gap_pos=5)
    assert info.tsd_len == len(tsd)             # <=1 mismatch tolerated


def test_no_tsd_no_te(opt):
    gap = _s("GGGG" + "CCGGTTAACC" + "A" * 12)
    flank = _s("TTTTAAAACCCC")                  # no shared prefix
    assert collect_te_info(opt, CINS, gap, flank, gap_pos=0) == NO_TE


def test_polyt_branch(opt):
    # no polyA tail; polyT right after the TSD instead (reverse insertion)
    tsd = "ACGTAC"
    gap = _s(tsd + "T" * 12 + "GGCCGGTTAACCGGCC")
    info = collect_te_info(opt, CINS, gap, _s(tsd + "GGGGCCCC"), gap_pos=0)
    assert info.polya_len == -12                # negative = polyT


def test_te_kmer_index_classify(tmp_path):
    rng = np.random.default_rng(0)
    alu = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    l1 = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    fa = tmp_path / "te.fa"
    fa.write_text(f">AluY\n{alu}\n>L1\n{l1}\n")
    idx = TeKmerIndex(str(fa), k=15)
    assert idx.names == ["AluY", "L1"]
    # forward fragment of AluY -> (0, False)
    frag = _s(alu[100:180])
    assert idx.classify(frag) == (0, False)
    # reverse complement of an L1 fragment -> (1, True)
    comp = {A: T, C: G, G: C, T: A}
    rc = np.array([comp[b] for b in _s(l1[50:130])[::-1]], dtype=np.uint8)
    assert idx.classify(rc) == (1, True)
    # random sequence: fewer than 3 hits -> unclassified
    rnd = rng.integers(0, 4, 80).astype(np.uint8)
    assert idx.classify(rnd)[0] == -1


def test_vntr_cyclic_match():
    unit = _s("ACGGT")
    s1 = np.tile(unit, 6)
    s2 = np.roll(s1, 3)                        # cyclic rotation -> match
    assert vntr_fuzzy_comp_seq(s1, s2) == 0
    rng = np.random.default_rng(1)
    s3 = rng.integers(0, 4, len(s1)).astype(np.uint8)
    assert vntr_fuzzy_comp_seq(s1, s3) == 1
    # 80% similarity boundary: a rotation with a few substitutions still
    # matches
    s4 = np.roll(s1, 2).copy()
    s4[::10] = (s4[::10] + 1) % 4
    assert vntr_fuzzy_comp_seq(s1, s4) == 0
