"""digar extraction: eqx vs cs-tag vs ref-compare sources must agree."""

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.digar import (collect_digar_eqx,
                                      collect_digar_from_cs,
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
    quals = np.full(len(read), 40, dtype=np.uint8)
    rec_eqx = BamRecord(make_record(0, pos0, "r1", cig_eqx, read, quals))
    rec_cs = BamRecord(make_record(0, pos0, "r1", cig_m, read, quals,
                                   tags=z_tag("cs", cs)))
    rec_m = BamRecord(make_record(0, pos0, "r1", cig_m, read, quals))
    return ref, rec_eqx, rec_cs, rec_m


def test_three_sources_agree():
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 4, 300).astype(np.uint8)
    ref_full = np.concatenate([np.zeros(100, dtype=np.uint8), ref])
    _, rec_eqx, rec_cs, rec_m = _mk(ref)
    opt = CallOpts.hifi()
    d1, r1, _ = collect_digar_eqx(rec_eqx, opt, 1, 10_000, 10_000)
    d2, r2, _ = collect_digar_from_cs(rec_cs, opt, 1, 10_000, 10_000)
    d3, r3, _ = collect_digar_from_ref(rec_m, opt, 1, 10_000, 10_000,
                                       ref_full, 1)
    for d in (d1, d2, d3):
        assert d is not None
    for other in (d2, d3):
        assert (d1.pos == other.pos).all()
        assert (d1.type == other.type).all()
        assert (d1.len == other.len).all()
        assert (d1.qi == other.qi).all()
        assert (d1.low_qual == other.low_qual).all()
    assert r1 == r2 == r3
    # event content sanity: one X, one 3bp INS, one 2bp DEL
    m = d1.var_mask()
    assert (d1.type[m] == 8).sum() == 1
    ins = np.nonzero(d1.type == 1)[0]
    assert len(ins) == 1 and d1.len[ins[0]] == 3
    dele = np.nonzero(d1.type == 2)[0]
    assert len(dele) == 1 and d1.len[dele[0]] == 2


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
