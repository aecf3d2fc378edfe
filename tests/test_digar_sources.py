"""digar extraction: eqx vs cs-tag vs MD-tag vs ref-compare sources must
agree (and MD must stay authoritative when it conflicts with the FASTA)."""

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.digar import (collect_digar_eqx,
                                      collect_digar_from_cs,
                                      collect_digar_from_md,
                                      collect_digar_from_ref)
from longcalld_tpu.io.bam import BamRecord
from tests.util_bam import make_record, z_tag

NT = "ACGTN"


def _mk(seq_ref, pos0=100):
    """Build a read with SNP at +20, 3bp INS at +120, 2bp DEL at +180
    (spread out so the noisy-density detector stays quiet)."""
    rng = np.random.default_rng(3)
    ref = seq_ref
    read = np.concatenate([
        ref[:20], [(ref[20] + 1) % 4], ref[21:120],
        rng.integers(0, 4, 3).astype(np.uint8), ref[120:180], ref[182:300]])
    cig_eqx = [(7, 20), (8, 1), (7, 99), (1, 3), (7, 60), (2, 2), (7, 118)]
    cig_m = [(0, 120), (1, 3), (0, 60), (2, 2), (0, 118)]
    cs = (f":20*{NT[ref[20]].lower()}{NT[read[20]].lower()}:99"
          f"+{''.join(NT[b].lower() for b in read[120:123])}:60"
          f"-{''.join(NT[b].lower() for b in ref[180:182])}:118")
    # MD covers M-consumed ref bases only: 20 =, ref base, 159 = (spanning
    # the insertion), ^<2 del bases>, 118 =
    md = (f"20{NT[ref[20]]}159"
          f"^{''.join(NT[b] for b in ref[180:182])}118")
    quals = np.full(len(read), 40, dtype=np.uint8)
    rec_eqx = BamRecord(make_record(0, pos0, "r1", cig_eqx, read, quals))
    rec_cs = BamRecord(make_record(0, pos0, "r1", cig_m, read, quals,
                                   tags=z_tag("cs", cs)))
    rec_md = BamRecord(make_record(0, pos0, "r1", cig_m, read, quals,
                                   tags=z_tag("MD", md)))
    rec_m = BamRecord(make_record(0, pos0, "r1", cig_m, read, quals))
    return ref, rec_eqx, rec_cs, rec_md, rec_m


def test_sources_agree():
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 4, 300).astype(np.uint8)
    ref_full = np.concatenate([np.zeros(100, dtype=np.uint8), ref])
    _, rec_eqx, rec_cs, rec_md, rec_m = _mk(ref)
    opt = CallOpts.hifi()
    d1, r1, _ = collect_digar_eqx(rec_eqx, opt, 1, 10_000, 10_000)
    d2, r2, _ = collect_digar_from_cs(rec_cs, opt, 1, 10_000, 10_000)
    d3, r3, _ = collect_digar_from_ref(rec_m, opt, 1, 10_000, 10_000,
                                       ref_full, 1)
    d4, r4, _ = collect_digar_from_md(rec_md, opt, 1, 10_000, 10_000)
    for d in (d1, d2, d3, d4):
        assert d is not None
    for other in (d2, d3, d4):
        assert (d1.pos == other.pos).all()
        assert (d1.type == other.type).all()
        assert (d1.len == other.len).all()
        assert (d1.qi == other.qi).all()
        assert (d1.low_qual == other.low_qual).all()
    assert r1 == r2 == r3 == r4
    # event content sanity: one X, one 3bp INS, one 2bp DEL
    m = d1.var_mask()
    assert (d1.type[m] == 8).sum() == 1
    ins = np.nonzero(d1.type == 1)[0]
    assert len(ins) == 1 and d1.len[ins[0]] == 3
    dele = np.nonzero(d1.type == 2)[0]
    assert len(dele) == 1 and d1.len[dele[0]] == 2


def test_md_authoritative_over_fasta():
    """When the MD tag disagrees with the loaded FASTA (aligner used a
    different reference), the MD source keeps the aligner's =/X split while
    ref-compare follows the FASTA — this is exactly the divergence the MD
    path exists for (/root/reference/src/bam_utils.c:1003: MD is parsed,
    the reference sequence is never consulted)."""
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 4, 200).astype(np.uint8)
    read = ref.copy()  # read == on-disk FASTA everywhere
    quals = np.full(200, 40, dtype=np.uint8)
    # but MD claims a mismatch at offset 50 (aligner's ref differed)
    md = f"50{NT[(ref[50] + 1) % 4]}149"
    rec = BamRecord(make_record(0, 0, "r", [(0, 200)], read, quals,
                                tags=z_tag("MD", md)))
    opt = CallOpts.hifi()
    d_md, _, _ = collect_digar_from_md(rec, opt, 1, 10_000, 10_000)
    x = np.nonzero(d_md.type == 8)[0]
    assert len(x) == 1 and d_md.pos[x[0]] == 51 and d_md.qi[x[0]] == 50
    # the alt base reported is the READ base
    assert d_md.alt_seq(int(x[0]))[0] == read[50]
    rec_plain = BamRecord(make_record(0, 0, "r", [(0, 200)], read, quals))
    d_ref, _, _ = collect_digar_from_ref(rec_plain, opt, 1, 10_000, 10_000,
                                         ref, 1)
    assert (d_ref.type == 8).sum() == 0  # FASTA view: no mismatch


def test_md_zero_runs_and_adjacent_events():
    """samtools-calmd style MD quirks: 0-length eq runs between adjacent
    mismatches and around deletions parse to the same digars as eqx."""
    rng = np.random.default_rng(6)
    ref = rng.integers(0, 4, 120).astype(np.uint8)
    read = ref.copy()
    read[40] = (ref[40] + 1) % 4
    read[41] = (ref[41] + 2) % 4       # adjacent mismatches
    read2 = np.concatenate([read[:80], read[82:]])  # 2bp DEL at +80
    quals = np.full(len(read2), 40, dtype=np.uint8)
    md = (f"40{NT[ref[40]]}0{NT[ref[41]]}38"
          f"0^{NT[ref[80]]}{NT[ref[81]]}0"      # 0s around the deletion
          f"38")
    rec_md = BamRecord(make_record(0, 0, "r", [(0, 80), (2, 2), (0, 38)],
                                   read2, quals, tags=z_tag("MD", md)))
    cig_eqx = [(7, 40), (8, 1), (8, 1), (7, 38), (2, 2), (7, 38)]
    rec_eqx = BamRecord(make_record(0, 0, "r", cig_eqx, read2, quals))
    opt = CallOpts.hifi()
    d_md, _, _ = collect_digar_from_md(rec_md, opt, 1, 10_000, 10_000)
    d_eqx, _, _ = collect_digar_eqx(rec_eqx, opt, 1, 10_000, 10_000)
    assert (d_md.pos == d_eqx.pos).all()
    assert (d_md.type == d_eqx.type).all()
    assert (d_md.len == d_eqx.len).all()
    assert (d_md.qi == d_eqx.qi).all()


def test_low_qual_marking():
    rng = np.random.default_rng(2)
    ref = rng.integers(0, 4, 100).astype(np.uint8)
    read = ref.copy()
    read[30] = (read[30] + 1) % 4
    cig = [(7, 30), (8, 1), (7, 69)]
    quals = np.full(100, 40, dtype=np.uint8)
    quals[30] = 5  # below min_bq
    rec = BamRecord(make_record(0, 0, "r", cig, read, quals))
    opt = CallOpts.hifi()
    d, regs, _ = collect_digar_eqx(rec, opt, 1, 10_000, 10_000)
    x = np.nonzero(d.type == 8)[0]
    assert len(x) == 1 and d.low_qual[x[0]]
