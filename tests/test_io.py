"""BGZF / BAM / FASTA reader tests against the bundled HG002 test data."""

import gzip
import io

import numpy as np
import pytest

from longcalld_tpu.io import bgzf
from longcalld_tpu.io.bam import BamReader
from longcalld_tpu.io.fasta import NT4_TABLE, FastaFile


def test_bgzf_roundtrip():
    payload = bytes(range(256)) * 1000
    buf = io.BytesIO()
    w = bgzf.BgzfWriter(buf)
    w.write(payload)
    w.close()
    data = buf.getvalue()
    assert data.endswith(bgzf.BGZF_EOF)
    assert bgzf.decompress_all(data) == payload
    # gzip stdlib can read BGZF too (concatenated members)
    assert gzip.decompress(data) == payload


def test_bgzf_threaded_writer_roundtrip():
    """n_threads>1 compresses blocks in a pool but must write them in
    order (hts_set_threads analog, call_var_main.c:756)."""
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 3_000_000, dtype=np.uint8).tobytes()
    buf = io.BytesIO()
    w = bgzf.BgzfWriter(buf, n_threads=4)
    for off in range(0, len(payload), 70_000):
        w.write(payload[off:off + 70_000])
    w.close()
    data = buf.getvalue()
    assert data.endswith(bgzf.BGZF_EOF)
    assert bgzf.decompress_all(data) == payload
    assert gzip.decompress(data) == payload


def test_bgzf_virtual_offsets(hifi_bam):
    r = bgzf.BgzfReader(hifi_bam)
    blk0 = r.read_block(0)
    assert blk0[:4] == b"BAM\x01"
    assert r.read_from(0, 4) == b"BAM\x01"
    # voffset into the middle of block 0
    assert r.read_from(2, 2) == blk0[2:4]


def test_bam_header_and_fetch(hifi_bam):
    bam = BamReader(hifi_bam)
    assert bam.references[10] == "chr11"
    assert bam.lengths[10] == 135086622
    tid = bam.name2tid("chr11")
    recs = bam.fetch(tid, 0, 2_000_000)
    assert len(recs) == 362
    # fetch a subregion: every returned read overlaps it
    sub = bam.fetch(tid, 1_300_000, 1_310_000)
    assert 0 < len(sub) < len(recs)
    for r in sub:
        assert r.pos < 1_310_000 and r.endpos > 1_300_000
    # record content sanity
    r0 = recs[0]
    assert r0.l_seq == len(r0.seq_nt4()) == len(r0.qual())
    c = r0.cigar_array()
    q_len = int(c[np.isin(c[:, 0], (0, 1, 4, 7, 8)), 1].sum())
    assert q_len == r0.l_seq
    assert r0.get_nm() >= 0
    assert r0.has_eqx_cigar()


def test_fasta_fetch(chr11_fa):
    fa = FastaFile(chr11_fa)
    assert fa.seq_len("chr11") == 2_000_000
    s = fa.fetch("chr11", 1_000_000, 1_000_059)
    assert len(s) == 60
    assert set(s) <= set(b"ACGTNacgtn")
    nt4 = fa.fetch_nt4("chr11", 1_000_000, 1_000_059)
    assert (nt4 == NT4_TABLE[np.frombuffer(s, dtype=np.uint8)]).all()
    # inclusive-end convention
    assert len(fa.fetch("chr11", 0, 0)) == 1
