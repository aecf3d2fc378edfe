"""Cross-window stitching: haplotype flip + phase-set extension via shared
boundary reads (flip_variant_hap semantics)."""

import io

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call
from tests.util_bam import make_record, write_bam


def _write_fasta(path, name, seq4):
    with open(path, "w") as f:
        f.write(f">{name}\n")
        s = "".join("ACGTN"[b] for b in seq4)
        for i in range(0, len(s), 60):
            f.write(s[i:i + 60] + "\n")
    # .fai: name len offset linebases linewidth
    with open(path + ".fai", "w") as f:
        f.write(f"{name}\t{len(s)}\t{len(name) + 2}\t60\t61\n")


@pytest.fixture()
def two_window_data(tmp_path):
    rng = np.random.default_rng(11)
    L = 4000
    ref = rng.integers(0, 4, L).astype(np.uint8)
    # het SNPs every ~150bp across both windows (window size will be 2000)
    snp_pos = list(range(100, L - 100, 150))
    hap1 = ref.copy()
    for p in snp_pos:
        hap1[p] = (hap1[p] + 1) % 4
    hap2 = ref
    fa = tmp_path / "ref.fa"
    _write_fasta(str(fa), "chrT", ref)

    records = []
    read_len = 1200
    qname_i = 0
    for start in range(0, L - read_len + 1, 100):
        for hap_seq, hap_name in ((hap1, "h1"), (hap2, "h2")):
            seq = hap_seq[start:start + read_len]
            # eqx cigar vs ref
            eq = ref[start:start + read_len] == seq
            ops = []
            i = 0
            while i < read_len:
                j = i
                while j < read_len and eq[j] == eq[i]:
                    j += 1
                ops.append((7 if eq[i] else 8, j - i))
                i = j
            records.append(make_record(
                0, start, f"{hap_name}_{qname_i}", ops, seq,
                np.full(read_len, 40, dtype=np.uint8)))
            qname_i += 1
    records.sort(key=lambda r: int.from_bytes(r[4:8], "little", signed=True))
    bam = tmp_path / "reads.bam"
    write_bam(str(bam), ["chrT"], [L], records)
    return str(fa), str(bam), snp_pos


def test_two_window_stitch(two_window_data):
    fa, bam, snp_pos = two_window_data
    opt = CallOpts.hifi(ref_fa_fn=fa, in_bam_fns=[bam], window_size=2000,
                        use_device=False, only_autosome_XY=False)
    buf = io.StringIO()
    n = run_call(opt, buf, "test")
    lines = [l for l in buf.getvalue().splitlines() if not l.startswith("#")]
    assert n == len(lines)
    called = {}
    ps_by_pos = {}
    for l in lines:
        f = l.split("\t")
        pos = int(f[1])
        d = dict(zip(f[8].split(":"), f[9].split(":")))
        called[pos] = d["GT"]
        if "PS" in d:
            ps_by_pos[pos] = d["PS"]
    # every well-covered het SNP called and phased (ends are low-depth)
    core = [p for p in snp_pos if 500 <= p <= 3500]
    for p in core:
        assert p + 1 in called, f"SNP at {p+1} missing"
        assert called[p + 1] in ("0|1", "1|0")
    # stitching: all SNPs share ONE phase set across the window boundary
    assert len(set(ps_by_pos.values())) == 1, ps_by_pos
    # and the hap assignment is consistent: all SNPs came from hap1, so all
    # GTs must be identical after stitching (no flip within/between windows)
    gts = {called[p + 1] for p in core}
    assert len(gts) == 1, gts
