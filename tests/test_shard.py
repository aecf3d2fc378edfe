"""Multi-host sharding: per-chunk window partition + lossless VCF merge."""

import io

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.pipeline import run_call

REGIONS = ["chr11:1236000-1300000", "chr11:1300001-1450000"]


def _call(chr11_fa, hifi_bam, shard=None):
    opt = CallOpts.hifi(ref_fa_fn=chr11_fa, in_bam_fns=[hifi_bam],
                        regions=REGIONS, use_device=False, shard=shard)
    buf = io.StringIO()
    run_call(opt, buf, "test")
    return buf.getvalue()


def test_shards_partition_and_merge(chr11_fa, hifi_bam, tmp_path):
    from longcalld_tpu.cli import merge_vcfs
    full = _call(chr11_fa, hifi_bam)
    parts = []
    for i in range(2):
        text = _call(chr11_fa, hifi_bam, shard=f"{i}/2")
        p = tmp_path / f"shard{i}.vcf"
        p.write_text(text)
        parts.append(str(p))
        body = [l for l in text.splitlines() if not l.startswith("#")]
        assert body, f"shard {i} empty"
    out = io.StringIO()
    merge_vcfs(parts, out)
    merged = [l for l in out.getvalue().splitlines() if not l.startswith("#")]
    full_body = [l for l in full.splitlines() if not l.startswith("#")]
    assert merged == full_body


def test_bad_shard_spec(chr11_fa, hifi_bam):
    import pytest
    with pytest.raises(ValueError):
        _call(chr11_fa, hifi_bam, shard="3/2")


def test_shard_auto_single_process(chr11_fa, hifi_bam):
    """--shard auto resolves to jax.process_index()/process_count(); in a
    single-process run that is 0/1, i.e. identical to unsharded output."""
    assert _call(chr11_fa, hifi_bam, shard="auto") \
        == _call(chr11_fa, hifi_bam)


def test_shard_auto_multi_process(chr11_fa, hifi_bam, tmp_path,
                                  monkeypatch):
    """The actual multi-host code path: simulate a 2-process jax job by
    patching process_index/process_count, run `--shard auto` as each rank,
    and assert the two auto-shards partition the unsharded output exactly
    (the contract a real jax.distributed job relies on)."""
    import jax

    from longcalld_tpu.cli import merge_vcfs

    full = _call(chr11_fa, hifi_bam)
    parts = []
    for rank in range(2):
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        text = _call(chr11_fa, hifi_bam, shard="auto")
        monkeypatch.undo()
        assert text == _call(chr11_fa, hifi_bam, shard=f"{rank}/2")
        p = tmp_path / f"auto{rank}.vcf"
        p.write_text(text)
        parts.append(str(p))
    out = io.StringIO()
    merge_vcfs(parts, out)
    merged = [l for l in out.getvalue().splitlines()
              if not l.startswith("#")]
    assert merged == [l for l in full.splitlines() if not l.startswith("#")]


def test_merge_bgzipped_shards(chr11_fa, hifi_bam, tmp_path):
    """`merge` accepts .vcf.gz shards (bgzf is gzip-compatible) and still
    reproduces the unsharded body."""
    from longcalld_tpu.cli import main as cli_main
    import io as _io
    import contextlib
    full = _call(chr11_fa, hifi_bam)
    paths = []
    for i in range(2):
        gz = str(tmp_path / f"s{i}.vcf.gz")
        rc = cli_main(["call", chr11_fa, hifi_bam, *REGIONS, "--hifi",
                       "--no-device", "--shard", f"{i}/2", "-O", "z",
                       "-o", gz])
        assert rc == 0
        paths.append(gz)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli_main(["merge"] + paths)
    merged = [l for l in buf.getvalue().splitlines()
              if not l.startswith("##")]
    want = [l for l in full.splitlines() if not l.startswith("##")]
    assert merged == want
