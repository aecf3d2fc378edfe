"""CRAM 3.0 container: codecs, round-trip fidelity, indexed fetch, and
pipeline integration (CRAM input -> identical VCF; --out-cram output)."""

import io

import numpy as np
import pytest

from longcalld_tpu.io.bam import BamReader
from longcalld_tpu.io.cram import (Cursor, CramReader, CramWriter, itf8,
                                   ltf8, rans_compress, rans_uncompress)

REGION_BEG, REGION_END = 1_250_000, 1_290_000


def test_itf8_ltf8_roundtrip():
    for v in (0, 1, 127, 128, 5000, 1 << 20, 1 << 27, (1 << 31) - 1, -1,
              -100, -(1 << 31)):
        assert Cursor(itf8(v)).itf8() == v, v
    for v in (0, 127, 128, 1 << 40, (1 << 62), -1, -(1 << 40)):
        assert Cursor(ltf8(v)).ltf8() == v, v


def test_rans_roundtrip():
    rng = np.random.default_rng(0)
    for data in (b"", b"x", b"hello" * 1000,
                 bytes(rng.integers(30, 75, 50000, dtype=np.uint8))):
        for order in (0, 1):
            assert rans_uncompress(rans_compress(data, order)) == data


@pytest.fixture(scope="module")
def cram_file(hifi_bam, chr11_fa, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cram")
    path = str(tmp / "test.cram")
    bam = BamReader(hifi_bam)
    w = CramWriter(path, bam.header_text, list(bam.references),
                   list(bam.lengths), chr11_fa)
    for rec in bam:
        w.write_record(rec)
    w.close()
    return path


def test_cram_roundtrip_fidelity(hifi_bam, chr11_fa, cram_file):
    orig = list(BamReader(hifi_bam))
    back = list(CramReader(cram_file, chr11_fa))
    assert len(back) == len(orig) > 300
    for a, b in zip(orig, back):
        assert a.qname == b.qname
        assert (a.flag, a.tid, a.pos, a.mapq) == (b.flag, b.tid, b.pos,
                                                  b.mapq)
        assert a.cigar_array().tolist() == b.cigar_array().tolist()
        assert bytes(a.seq_nt4()) == bytes(b.seq_nt4())
        assert bytes(a.qual()) == bytes(b.qual())
        for t in ("NM", "MD", "RG"):
            assert a.get_tag(t) == b.get_tag(t)


def test_cram_smaller_than_bam(hifi_bam, cram_file):
    import os
    assert os.path.getsize(cram_file) < 0.6 * os.path.getsize(hifi_bam)


def test_cram_indexed_fetch(hifi_bam, chr11_fa, cram_file):
    bam = BamReader(hifi_bam)
    cr = CramReader(cram_file, chr11_fa)
    tid = bam.name2tid("chr11")
    for beg, end in ((1_250_000, 1_251_000), (1_400_000, 1_410_000),
                     (10, 20)):
        a = {r.qname for r in bam.fetch(tid, beg, end)}
        b = {r.qname for r in cr.fetch(tid, beg, end)}
        assert a == b


def test_pipeline_cram_input_matches_bam(hifi_bam, chr11_fa, cram_file):
    from longcalld_tpu.config import CallOpts
    from longcalld_tpu.core.pipeline import run_call

    def call(path):
        opt = CallOpts.hifi(
            ref_fa_fn=chr11_fa, in_bam_fns=[path], use_device=False,
            regions=[f"chr11:{REGION_BEG}-{REGION_END}"])
        buf = io.StringIO()
        run_call(opt, buf, "test")
        return [l for l in buf.getvalue().splitlines()
                if not l.startswith("#")]

    assert call(cram_file) == call(hifi_bam)


def test_out_cram_phased(hifi_bam, chr11_fa, tmp_path):
    from longcalld_tpu.config import CallOpts
    from longcalld_tpu.core.pipeline import run_call

    out = str(tmp_path / "phased.cram")
    opt = CallOpts.hifi(
        ref_fa_fn=chr11_fa, in_bam_fns=[hifi_bam], use_device=False,
        regions=[f"chr11:{REGION_BEG}-{REGION_END}"],
        out_bam_fn=out, out_is_cram=True)
    run_call(opt, io.StringIO(), "test")
    recs = list(CramReader(out, chr11_fa))
    assert len(recs) > 20
    n_hp = sum(1 for r in recs if r.get_tag("HP") in (1, 2))
    assert n_hp > 10
    ps = {r.get_tag("PS") for r in recs if r.get_tag("HP") in (1, 2)}
    assert all(p is not None for p in ps)
