"""Reference-CLI compatibility surface: positional regions, -L list
input, -X extra BAMs, -S SAM output, -O z bgzip output, tunable aliases
(call_var_main.c:820-905 usage)."""

import gzip


from longcalld_tpu.cli import main as cli_main
from longcalld_tpu.io.bam import BamReader



REGION = "chr11:1240000-1250000"


def _run(argv, capsys):
    rc = cli_main(argv)
    assert rc == 0
    return capsys.readouterr().out


def test_positional_region_equals_r_flag(chr11_fa, hifi_bam, capsys):
    pos = _run(["call", chr11_fa, hifi_bam, REGION, "--hifi"], capsys)
    flg = _run(["call", chr11_fa, hifi_bam, "-r", REGION, "--hifi"], capsys)
    body = lambda v: [l for l in v.splitlines() if not l.startswith("##")]
    assert body(pos) == body(flg)
    assert len(body(pos)) > 10


def test_input_list_and_extra_bam(chr11_fa, hifi_bam, tmp_path, capsys):
    lst = tmp_path / "bams.txt"
    lst.write_text(hifi_bam + "\n")
    body = lambda v: [l for l in v.splitlines() if not l.startswith("##")]
    one = _run(["call", chr11_fa, hifi_bam, REGION, "--hifi"], capsys)
    via_list = _run(["call", chr11_fa, "-L", str(lst), REGION, "--hifi"],
                    capsys)
    assert body(one) == body(via_list)
    # -X doubles the sample depth at every shared site
    dbl = _run(["call", chr11_fa, hifi_bam, "-X", hifi_bam, REGION,
                "--hifi"], capsys)

    def dp_by_pos(v):
        out = {}
        for l in v.splitlines():
            if l.startswith("#"):
                continue
            f = l.split("\t")
            fmt = dict(zip(f[8].split(":"), f[9].split(":")))
            out[int(f[1])] = int(fmt["DP"])
        return out
    d1, d2 = dp_by_pos(one), dp_by_pos(dbl)
    shared = sorted(set(d1) & set(d2))
    assert len(shared) >= 10
    assert all(d2[p] == 2 * d1[p] for p in shared)


def test_out_sam_matches_input_records(chr11_fa, hifi_bam, tmp_path,
                                       capsys):
    sam_path = str(tmp_path / "phased.sam")
    _run(["call", chr11_fa, hifi_bam, REGION, "--hifi", "-S", sam_path],
         capsys)
    lines = open(sam_path).read().splitlines()
    recs = [l.split("\t") for l in lines if not l.startswith("@")]
    assert recs, "no SAM records written"
    bam = BamReader(hifi_bam)
    by_name = {}
    tid = bam.name2tid("chr11")
    for r in bam.fetch(tid, 1_230_000, 1_260_000):
        by_name[r.qname] = r
    n_checked = 0
    for f in recs:
        src = by_name.get(f[0])
        if src is None:
            continue
        assert int(f[3]) == src.pos + 1
        assert int(f[4]) == src.mapq
        assert f[2] == "chr11"
        assert len(f[9]) == src.l_seq
        n_checked += 1
    assert n_checked == len(recs)
    assert any("HP:i:" in l for l in lines)


def test_out_type_z_bgzips(chr11_fa, hifi_bam, tmp_path, capsys):
    gz = str(tmp_path / "out.vcf.gz")
    _run(["call", chr11_fa, hifi_bam, REGION, "--hifi", "-O", "z",
          "-o", gz], capsys)
    # bgzf is gzip-compatible
    lines = gzip.open(gz, "rt").read().splitlines()
    assert lines[0].startswith("##fileformat")
    assert sum(1 for l in lines if not l.startswith("#")) > 10


def test_tunable_aliases_apply(chr11_fa, hifi_bam, capsys):
    # raising --min-cov should strictly reduce the record count
    base = _run(["call", chr11_fa, hifi_bam, REGION, "--hifi"], capsys)
    strict = _run(["call", chr11_fa, hifi_bam, REGION, "--hifi",
                   "--min-cov", "15"], capsys)
    nb = sum(1 for l in base.splitlines() if not l.startswith("#"))
    ns = sum(1 for l in strict.splitlines() if not l.startswith("#"))
    assert ns < nb


def test_refine_aln_sam_output(chr11_fa, hifi_bam, tmp_path, capsys):
    """--refine-aln with -S: refined records re-encode cleanly as SAM
    (CIGAR stays =/X-style and consumes exactly the read length)."""
    import re
    sam_path = str(tmp_path / "refined.sam")
    _run(["call", chr11_fa, hifi_bam, REGION, "--hifi", "--refine-aln",
          "-S", sam_path, "--no-device"], capsys)
    recs = [l.split("\t") for l in open(sam_path) if not l.startswith("@")]
    assert recs
    for f in recs:
        cig = f[5]
        assert "M" not in cig, "refined CIGAR must stay =/X-coded"
        q_consume = sum(int(n) for n, op in
                        re.findall(r"(\d+)([MIDNSHP=X])", cig)
                        if op in "MIS=X")
        assert q_consume == len(f[9]), f[0]
