"""Whole-BAM digar-source parity (VERDICT r2 item 6).

The reference treats its four digar sources as interchangeable
(/root/reference/src/bam_utils.c:701-1327): =X CIGAR, minimap2 cs tag,
MD tag, and direct base-vs-ref comparison must yield the same events.
This test re-encodes EVERY read of the real HG002 chr11 HiFi BAM three
ways — (a) MD-only (=X collapsed to M, fresh MD tag), (b) cs-only,
(c) tagless M-CIGAR (forces the ref-compare source) — runs the full
pipeline on each, and asserts the VCF records are byte-identical to the
original =X run.
"""

import io

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call
from longcalld_tpu.io.bam import BamReader
from longcalld_tpu.io.fasta import FastaFile

from util_bam import make_record, write_bam, z_tag

CMATCH, CINS, CDEL, CSOFT, CHARD, CEQUAL, CDIFF = 0, 1, 2, 4, 5, 7, 8
NT = "ACGTN"


def _walk(rec, ref4):
    """Walk one aligned record; return (md, cs, nm, m_cigar) where m_cigar
    has =/X collapsed into M runs."""
    cig = rec.cigar_array()
    seq4 = rec.seq_nt4()
    md_parts = []
    cs_parts = []
    nm = 0
    m_cig = []

    def push_m(op, ln):
        if m_cig and m_cig[-1][0] == op and op == CMATCH:
            m_cig[-1][1] += ln
        else:
            m_cig.append([op, ln])

    ri = rec.pos          # 0-based ref cursor
    qi = 0
    md_run = 0            # matches since last MD event
    cs_run = 0
    for op, ln in cig:
        op, ln = int(op), int(ln)
        if op in (CSOFT, CHARD):
            push_m(op, ln)
            if op == CSOFT:
                qi += ln
            continue
        if op == CINS:
            push_m(op, ln)
            cs_parts.append(f":{cs_run}" if cs_run else None)
            cs_run = 0
            cs_parts.append("+" + "".join(NT[int(b)].lower()
                                          for b in seq4[qi:qi + ln]))
            nm += ln
            qi += ln
            continue
        if op == CDEL:
            push_m(op, ln)
            dseq = "".join(NT[int(b)] for b in ref4[ri:ri + ln])
            md_parts.append(f"{md_run}^{dseq}")
            md_run = 0
            if cs_run:
                cs_parts.append(f":{cs_run}")
                cs_run = 0
            cs_parts.append("-" + dseq.lower())
            nm += ln
            ri += ln
            continue
        if op in (CMATCH, CEQUAL, CDIFF):
            push_m(CMATCH, ln)
            for k in range(ln):
                same = int(seq4[qi + k]) == int(ref4[ri + k]) \
                    if op == CMATCH else (op == CEQUAL)
                if same:
                    md_run += 1
                    cs_run += 1
                else:
                    rb, qb = NT[int(ref4[ri + k])], NT[int(seq4[qi + k])]
                    md_parts.append(f"{md_run}{rb}")
                    md_run = 0
                    if cs_run:
                        cs_parts.append(f":{cs_run}")
                        cs_run = 0
                    cs_parts.append(f"*{rb.lower()}{qb.lower()}")
                    nm += 1
            ri += ln
            qi += ln
            continue
        raise AssertionError(f"unhandled op {op}")
    md_parts.append(str(md_run))
    if cs_run:
        cs_parts.append(f":{cs_run}")
    md = "".join(md_parts)
    cs = "".join(p for p in cs_parts if p)
    return md, cs, nm, [(op, ln) for op, ln in m_cig]


def _i_tag(name: str, value: int) -> bytes:
    import struct
    return name.encode() + b"i" + struct.pack("<i", value)


@pytest.fixture(scope="module")
def rewritten(tmp_path_factory):
    ref = "/root/reference/test_data/chr11_2M.fa"
    bam = "/root/reference/test_data/HG002_chr11_hifi_test.bam"
    import os
    if not (os.path.exists(ref) and os.path.exists(bam)):
        pytest.skip("HG002 test data unavailable")
    tmp = tmp_path_factory.mktemp("digar_src")
    fa = FastaFile(ref)
    ref4 = fa.fetch_nt4("chr11", 0, fa.seq_len("chr11") - 1)
    rd = BamReader(bam)
    tid = rd.name2tid("chr11")
    out = {"md": [], "cs": [], "ref": []}
    n = 0
    for rec in rd.fetch(tid, 0, 2_000_000):
        md, cs, nm, m_cig = _walk(rec, ref4)
        base = dict(tid=0, pos=rec.pos, qname=rec.qname, cigar=m_cig,
                    seq4=rec.seq_nt4(), quals=rec.qual(), mapq=rec.mapq,
                    flag=rec.flag)
        nm_tag = _i_tag("NM", nm)
        out["md"].append(make_record(tags=nm_tag + z_tag("MD", md), **base))
        out["cs"].append(make_record(tags=nm_tag + z_tag("cs", cs), **base))
        out["ref"].append(make_record(tags=nm_tag, **base))
        n += 1
    assert n > 300
    paths = {}
    for key, recs in out.items():
        p = str(tmp / f"hg002_{key}.bam")
        write_bam(p, ["chr11"], [rd.lengths[tid]], recs)
        paths[key] = p
    return {"orig": bam, "ref_fa": ref, **paths}


def _records(ref_fa, bam):
    out = io.StringIO()
    opt = CallOpts.hifi(ref_fa_fn=ref_fa, in_bam_fns=[bam],
                        use_device=False)
    run_call(opt, out, "digar-src")
    return [l for l in out.getvalue().splitlines() if not l.startswith("#")]

@pytest.mark.parametrize("src", ["md", "cs", "ref"])
def test_whole_bam_source_parity(rewritten, src):
    want = _records(rewritten["ref_fa"], rewritten["orig"])
    got = _records(rewritten["ref_fa"], rewritten[src])
    assert len(want) > 400
    assert got == want
