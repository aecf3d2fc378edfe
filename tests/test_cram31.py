"""CRAM 3.1: rANS Nx16 codec (method 5) + 3.1 container read/write.

The htslib sources are absent from the snapshot, so fixtures are written
by our own 3.1 encoder; the decode-side transforms htslib emits but our
encoder does not (RLE, STRIPE) are exercised with hand-assembled streams
built per the CRAM codecs specification.
"""

import io
import os

import numpy as np
import pytest

from longcalld_tpu.io.cram import (RNX_CAT, RNX_N32, RNX_NOSZ, RNX_ORDER1,
                                   RNX_PACK, RNX_RLE, RNX_STRIPE,
                                   ransnx16_compress, ransnx16_uncompress)

REF = "/root/reference/test_data/chr11_2M.fa"
BAM = "/root/reference/test_data/HG002_chr11_hifi_test.bam"


def _u7(v: int) -> bytes:
    out = [v & 0x7F]
    v >>= 7
    while v:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    return bytes(reversed(out))


def _payload(data: bytes, flags: int = 0) -> bytes:
    """Entropy payload of an encode WITHOUT the flags/size prefix (for
    embedding inside hand-built RLE/STRIPE streams)."""
    enc = ransnx16_compress(data, flags)
    off = 1 + len(_u7(len(data)))      # flags byte + uint7 size
    return enc[off:]


@pytest.mark.parametrize("flags", [0, RNX_ORDER1, RNX_N32,
                                   RNX_ORDER1 | RNX_N32, RNX_CAT,
                                   RNX_PACK, RNX_PACK | RNX_ORDER1])
def test_ransnx16_roundtrip(flags):
    rng = np.random.default_rng(0)
    cases = [
        b"",
        b"A",
        bytes(rng.integers(0, 256, 10_000, dtype=np.uint8)),
        bytes(rng.choice([65, 66, 67, 68], p=[.7, .2, .07, .03],
                         size=50_000).astype(np.uint8)),
        bytes(np.clip(rng.normal(35, 3, 120_000), 10, 50)
              .astype(np.uint8)),
        b"read_name_12345 " * 3000,
        bytes(rng.integers(0, 256, 17, dtype=np.uint8)),
    ]
    for data in cases:
        enc = ransnx16_compress(data, flags)
        assert ransnx16_uncompress(enc, len(data)) == data


def test_ransnx16_order1_uses_context():
    """Order-1 must beat order-0 decisively on first-order-structured
    data — a context-plumbing bug would round-trip but not compress."""
    text = b"read_name_12345 " * 3000
    assert len(ransnx16_compress(text, RNX_ORDER1)) \
        < 0.25 * len(ransnx16_compress(text, 0))


def test_ransnx16_rle_decode():
    """Hand-assembled RLE stream (spec 'rle' transform): literals entropy
    coded, run lengths in the metadata."""
    data = b"AAAAABBBBBBBCCC" * 200
    lit, runs, rle_syms = [], [], {ord("A"), ord("B"), ord("C")}
    i = 0
    while i < len(data):
        j = i
        while j < len(data) and data[j] == data[i]:
            j += 1
        lit.append(data[i])
        runs.append(j - i - 1)
        i = j
    lit = bytes(lit)
    meta = bytes([len(rle_syms)]) + bytes(sorted(rle_syms))
    for r in runs:
        meta += _u7(r)
    stream = (bytes([RNX_RLE]) + _u7(len(data))
              + _u7((len(meta) << 1) | 1)      # raw metadata
              + _u7(len(lit)) + meta
              + _payload(lit, 0))
    assert ransnx16_uncompress(stream, len(data)) == data


def test_ransnx16_rle_compressed_meta_decode():
    """Same stream but with the RLE metadata itself rans-order-0
    compressed (even meta-length flag)."""
    data = b"GGGGGGGGTT" * 500
    lit, runs = [], []
    i = 0
    while i < len(data):
        j = i
        while j < len(data) and data[j] == data[i]:
            j += 1
        lit.append(data[i])
        runs.append(j - i - 1)
        i = j
    lit = bytes(lit)
    meta = bytes([2, ord("G"), ord("T")])
    for r in runs:
        meta += _u7(r)
    comp_meta = _payload(meta, 0)
    stream = (bytes([RNX_RLE]) + _u7(len(data))
              + _u7(len(meta) << 1)            # compressed metadata
              + _u7(len(lit))
              + _u7(len(comp_meta)) + comp_meta
              + _payload(lit, 0))
    assert ransnx16_uncompress(stream, len(data)) == data


@pytest.mark.parametrize("n_stripe", [2, 4])
def test_ransnx16_stripe_decode(n_stripe):
    """STRIPE: N byte-interleaved substreams, each NOSZ-encoded."""
    rng = np.random.default_rng(5)
    data = bytes(rng.choice([3, 9, 200, 201],
                            size=10_001).astype(np.uint8))
    subs = [ransnx16_compress(data[j::n_stripe], RNX_NOSZ)
            for j in range(n_stripe)]
    stream = bytes([RNX_STRIPE]) + _u7(len(data)) + bytes([n_stripe])
    for s in subs:
        stream += _u7(len(s))
    stream += b"".join(subs)
    assert ransnx16_uncompress(stream, len(data)) == data


def test_cram31_file_roundtrip(tmp_path):
    """Write a CRAM 3.1 (version bytes 3.1, method-5 blocks), read it
    back: records byte-identical to the source BAM's."""
    if not os.path.exists(BAM):
        pytest.skip("test data missing")
    from longcalld_tpu.io.bam import BamReader
    from longcalld_tpu.io.cram import CramReader, CramWriter
    src = BamReader(BAM)
    recs = [r for r in src][:400]
    path = str(tmp_path / "t31.cram")
    w = CramWriter(path, src.header_text, list(src.references),
                   list(src.lengths), REF, version=(3, 1))
    for r in recs:
        w.write_record(r)
    w.close()
    with open(path, "rb") as f:
        assert f.read(6) == b"CRAM\x03\x01"
    rd = CramReader(path, REF)
    got = rd.fetch(rd.name2tid("chr11"), 0, 3_000_000)
    assert len(got) == len(recs)
    for a, b in zip(got, recs):
        assert a._raw == b._raw


def test_cram31_input_calls_identically(tmp_path):
    """The VERDICT item-10 contract: a 3.1-encoded fixture decodes and
    CALLS identically to its BAM twin."""
    if not os.path.exists(BAM):
        pytest.skip("test data missing")
    from longcalld_tpu.config import CallOpts
    from longcalld_tpu.core.pipeline import run_call
    from longcalld_tpu.io.bam import BamReader
    from longcalld_tpu.io.cram import CramWriter
    src = BamReader(BAM)
    path = str(tmp_path / "in31.cram")
    w = CramWriter(path, src.header_text, list(src.references),
                   list(src.lengths), REF, version=(3, 1))
    for r in src:
        w.write_record(r)
    w.close()

    def call(in_fn):
        buf = io.StringIO()
        opt = CallOpts.hifi(ref_fa_fn=REF, in_bam_fns=[in_fn],
                            use_device=False,
                            regions=["chr11:1230000-1440000"])
        run_call(opt, buf, "cram31")
        return [l for l in buf.getvalue().splitlines()
                if not l.startswith("##")]

    assert call(path) == call(BAM)
