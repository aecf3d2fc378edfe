"""SAM text encoding of aux tags (io/bam_writer.py record_to_sam) and
HP/PS tag surgery (_strip_tags) against hand-built raw records."""

import struct

import numpy as np

from longcalld_tpu.io.bam import BamRecord
from longcalld_tpu.io.bam_writer import _strip_tags, record_to_sam

from util_bam import make_record


def _tags(*parts: bytes) -> bytes:
    return b"".join(parts)


def _rec(tags: bytes) -> BamRecord:
    seq = np.array([0, 1, 2, 3], dtype=np.uint8)
    quals = np.array([30, 31, 32, 33], dtype=np.uint8)
    raw = make_record(0, 100, "r1", [(7, 4)], seq, quals, mapq=17,
                      flag=16, tags=tags)
    return BamRecord(raw)


def test_tag_types_roundtrip_to_sam():
    tags = _tags(
        b"NM" + b"C" + struct.pack("<B", 7),
        b"AS" + b"s" + struct.pack("<h", -12),
        b"XL" + b"i" + struct.pack("<i", 123456),
        b"XF" + b"f" + struct.pack("<f", 0.25),
        b"RG" + b"Z" + b"grp1\x00",
        b"XA" + b"A" + b"+",
        b"XB" + b"B" + b"c" + struct.pack("<i", 3)
        + struct.pack("<3b", -1, 0, 2),
    )
    line = record_to_sam(_rec(tags), ["chr11"])
    cols = line.split("\t")
    assert cols[:6] == ["r1", "16", "chr11", "101", "17", "4="]
    assert cols[9] == "ACGT"
    assert cols[10] == "".join(chr(q + 33) for q in (30, 31, 32, 33))
    assert "NM:i:7" in cols and "AS:i:-12" in cols and "XL:i:123456" in cols
    assert "XF:f:0.25" in cols and "RG:Z:grp1" in cols and "XA:A:+" in cols
    assert "XB:B:c,-1,0,2" in cols


def test_strip_tags_removes_only_hp_ps():
    tags = _tags(
        b"HP" + b"i" + struct.pack("<i", 2),
        b"NM" + b"C" + struct.pack("<B", 1),
        b"PS" + b"i" + struct.pack("<i", 1234),
        b"RG" + b"Z" + b"grp1\x00",
    )
    rec = _rec(tags)
    stripped = BamRecord(_strip_tags(rec._raw, rec._tag_off))
    line = record_to_sam(stripped, ["chr11"])
    assert "HP:i:" not in line and "PS:i:" not in line
    assert "NM:i:1" in line and "RG:Z:grp1" in line
