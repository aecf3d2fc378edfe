"""Test helper: build raw BAM records / files in memory."""

import struct

import numpy as np

from longcalld_tpu.io import bgzf

NT4_TO_NT16 = [1, 2, 4, 8, 15]  # A C G T N


def make_record(tid, pos, qname, cigar, seq4, quals, mapq=60, flag=0,
                tags=b""):
    """cigar: list of (op, len) BAM codes; seq4: nt4 codes."""
    name = qname.encode() + b"\x00"
    n_cigar = len(cigar)
    l_seq = len(seq4)
    head = struct.pack("<iiBBHHHiiii", tid, pos, len(name), mapq, 0,
                       n_cigar, flag, l_seq, -1, -1, 0)
    cig = b"".join(struct.pack("<I", (ln << 4) | op) for op, ln in cigar)
    packed = bytearray((l_seq + 1) // 2)
    for i, b in enumerate(seq4):
        code = NT4_TO_NT16[int(b)]
        if i % 2 == 0:
            packed[i // 2] |= code << 4
        else:
            packed[i // 2] |= code
    qual = bytes(int(q) for q in quals)
    return head + name + cig + bytes(packed) + qual + tags


def z_tag(name: str, value: str) -> bytes:
    return name.encode() + b"Z" + value.encode() + b"\x00"


def write_bam(path, references, lengths, records):
    """records: list of raw record bytes (no block_size prefix)."""
    with open(path, "wb") as fh:
        w = bgzf.BgzfWriter(fh)
        text = "".join(f"@SQ\tSN:{n}\tLN:{l}\n"
                       for n, l in zip(references, lengths))
        hdr = bytearray(b"BAM\x01")
        hdr += struct.pack("<i", len(text)) + text.encode()
        hdr += struct.pack("<i", len(references))
        for n, l in zip(references, lengths):
            nb = n.encode() + b"\x00"
            hdr += struct.pack("<i", len(nb)) + nb + struct.pack("<i", l)
        w.write(bytes(hdr))
        for rec in records:
            w.write(struct.pack("<i", len(rec)) + rec)
        w.close()
