"""Test helper: build raw BAM records / files in memory."""

import struct

import numpy as np

from longcalld_tpu.io import bgzf

NT4_TO_NT16 = [1, 2, 4, 8, 15]  # A C G T N
_NT16_LUT = np.array(NT4_TO_NT16, dtype=np.uint8)


def make_record(tid, pos, qname, cigar, seq4, quals, mapq=60, flag=0,
                tags=b""):
    """cigar: list of (op, len) BAM codes; seq4: nt4 codes."""
    name = qname.encode() + b"\x00"
    n_cigar = len(cigar)
    l_seq = len(seq4)
    head = struct.pack("<iiBBHHHiiii", tid, pos, len(name), mapq, 0,
                       n_cigar, flag, l_seq, -1, -1, 0)
    cig = b"".join(struct.pack("<I", (ln << 4) | op) for op, ln in cigar)
    codes = _NT16_LUT[np.asarray(seq4, dtype=np.uint8)]
    if l_seq % 2:
        codes = np.concatenate([codes, np.zeros(1, np.uint8)])
    packed = ((codes[0::2] << 4) | codes[1::2]).astype(np.uint8)
    qual = np.asarray(quals, dtype=np.uint8).tobytes()
    return head + name + cig + packed.tobytes() + qual + tags


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


def sim_read(rng, ref4, start, length, hap, variants, err):
    """Simulate one read over ref4[start:start+length) for haplotype
    `hap` (1/2).  `variants`: {pos: (kind, payload, gt)} with kind in
    snv/ins/del, gt in het1/het2/hom; payload = alt base / ins base list /
    del length.  Returns (seq4, cigar)."""
    from longcalld_tpu.io.bam import CDEL, CDIFF, CEQUAL, CINS
    seq = []
    cig = []

    def push(op, ln):
        if ln <= 0:
            return
        if cig and cig[-1][0] == op:
            cig[-1][1] += ln
        else:
            cig.append([op, ln])

    i = start
    end = start + length
    while i < end:
        base = int(ref4[i])
        v = variants.get(i)
        on_hap = v is not None and (
            v[2] == "hom" or (v[2] == "het1" and hap == 1)
            or (v[2] == "het2" and hap == 2))
        if on_hap:
            kind, payload, _ = v
            if kind == "snv":
                seq.append(payload)
                push(CDIFF, 1)
                i += 1
                continue
            if kind == "ins":
                seq.append(base)
                push(CEQUAL, 1)
                seq.extend(payload)
                push(CINS, len(payload))
                i += 1
                continue
            seq.append(base)
            push(CEQUAL, 1)
            push(CDEL, payload)
            i += 1 + payload
            continue
        if rng.random() < err:
            seq.append((base + 1 + int(rng.integers(3))) % 4)
            push(CDIFF, 1)
        else:
            seq.append(base)
            push(CEQUAL, 1)
        i += 1
    import numpy as _np
    return _np.array(seq, dtype=_np.uint8), [(op, ln) for op, ln in cig]
