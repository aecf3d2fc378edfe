"""--checkpoint DIR: per-window persist + byte-identical resume."""

import io
import os

import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core import pipeline
from longcalld_tpu.core.pipeline import run_call

REF = "/root/reference/test_data/chr11_2M.fa"
BAM = "/root/reference/test_data/HG002_chr11_hifi_test.bam"
REGIONS = ["chr11:1230000-1329999", "chr11:1330000-1440000"]


def _opts(ckpt=None, **kw):
    return CallOpts.hifi(ref_fa_fn=REF, in_bam_fns=[BAM], regions=REGIONS,
                         window_size=50_000, checkpoint_dir=ckpt, **kw)


def _run(opt):
    buf = io.StringIO()
    n = run_call(opt, buf, "ckpt-test")
    return n, buf.getvalue()


@pytest.fixture(scope="module")
def fresh():
    if not os.path.exists(BAM):
        pytest.skip("test data missing")
    return _run(_opts())


def test_checkpointed_run_matches_fresh(tmp_path, fresh):
    n0, vcf0 = fresh
    n1, vcf1 = _run(_opts(str(tmp_path / "ck")))
    assert n1 == n0
    assert vcf1 == vcf0
    files = os.listdir(tmp_path / "ck")
    assert "meta.json" in files
    assert sum(f.startswith("win_") for f in files) > 2


def test_full_resume_replays_without_compute(tmp_path, fresh, monkeypatch):
    n0, vcf0 = fresh
    ck = str(tmp_path / "ck")
    _run(_opts(ck))

    def boom(*a, **k):
        raise AssertionError("window recomputed on full resume")

    monkeypatch.setattr(pipeline, "call_window", boom)
    n1, vcf1 = _run(_opts(ck))
    assert n1 == n0
    assert vcf1 == vcf0


def test_partial_resume_computes_only_missing(tmp_path, fresh, monkeypatch):
    n0, vcf0 = fresh
    ck = str(tmp_path / "ck")
    _run(_opts(ck))
    # drop two windows; the resume must recompute exactly those
    wins = sorted(f for f in os.listdir(ck) if f.startswith("win_"))
    victims = [wins[0], wins[len(wins) // 2]]
    for v in victims:
        os.unlink(os.path.join(ck, v))
    computed = []
    real = pipeline.call_window

    def spy(opt, chunk):
        computed.append(chunk.reg_beg)
        return real(opt, chunk)

    monkeypatch.setattr(pipeline, "call_window", spy)
    n1, vcf1 = _run(_opts(ck))
    assert n1 == n0
    assert vcf1 == vcf0
    # prefetch may compute at most the dropped (non-empty) windows
    assert 0 < len(computed) <= len(victims) + 2


def test_config_mismatch_is_refused(tmp_path, fresh):
    ck = str(tmp_path / "ck")
    _run(_opts(ck))
    with pytest.raises(ValueError, match="different configuration"):
        _run(_opts(ck, min_dp=9))


def test_vcf_only_checkpoint_refuses_bam_resume(tmp_path, fresh):
    """A checkpoint written without -b cannot be resumed into a -b run —
    the done windows carry no reads to replay."""
    ck = str(tmp_path / "ck")
    _run(_opts(ck))
    with pytest.raises(ValueError, match="different configuration"):
        _run(_opts(ck, out_bam_fn=str(tmp_path / "o.bam")))


def _bam_records(path):
    from longcalld_tpu.io.bam import BamReader
    return [r._raw for r in BamReader(path)]


@pytest.mark.parametrize("refine", [False, True])
def test_checkpoint_bam_output(tmp_path, refine):
    """--checkpoint composes with -b (and --refine-aln): the checkpointed
    run's BAM matches a plain -b run record-for-record, and a kill-anywhere
    resume reproduces BAM + VCF byte-identically
    (src/bam_utils.c:1718-2048 is the path being checkpointed)."""
    if not os.path.exists(BAM):
        pytest.skip("test data missing")
    plain_bam = str(tmp_path / "plain.bam")
    n0, vcf0 = _run(_opts(out_bam_fn=plain_bam, refine_bam=refine))

    ck = str(tmp_path / "ck")
    ck_bam = str(tmp_path / "ck.bam")
    n1, vcf1 = _run(_opts(ck, out_bam_fn=ck_bam, refine_bam=refine))
    assert (n1, vcf1) == (n0, vcf0)
    assert _bam_records(ck_bam) == _bam_records(plain_bam)
    with open(ck_bam, "rb") as f:
        ck_bytes = f.read()
    with open(plain_bam, "rb") as f:
        assert ck_bytes == f.read()   # identical stream -> identical bgzf

    # kill at a window boundary, resume: byte-identical BAM + VCF
    import numpy as np
    rng = np.random.default_rng(7 if refine else 3)
    wins = sorted((f for f in os.listdir(ck) if f.startswith("win_")),
                  key=lambda f: int(f[4:-4]))
    cut = int(rng.integers(1, len(wins)))
    for v in wins[cut:]:
        os.unlink(os.path.join(ck, v))
    res_bam = str(tmp_path / "res.bam")
    n2, vcf2 = _run(_opts(ck, out_bam_fn=res_bam, refine_bam=refine))
    assert (n2, vcf2) == (n0, vcf0)
    with open(res_bam, "rb") as f:
        assert f.read() == ck_bytes


def test_checkpoint_cram_output(tmp_path):
    """-C + --checkpoint: resumed CRAM byte-identical to the plain run."""
    if not os.path.exists(BAM):
        pytest.skip("test data missing")
    plain = str(tmp_path / "plain.cram")
    _run(_opts(out_bam_fn=plain, out_is_cram=True))
    ck = str(tmp_path / "ck")
    res = str(tmp_path / "res.cram")
    _run(_opts(ck, out_bam_fn=str(tmp_path / "ck.cram"), out_is_cram=True))
    wins = sorted((f for f in os.listdir(ck) if f.startswith("win_")),
                  key=lambda f: int(f[4:-4]))
    for v in wins[1:]:
        os.unlink(os.path.join(ck, v))
    _run(_opts(ck, out_bam_fn=res, out_is_cram=True))
    with open(plain, "rb") as f0, open(res, "rb") as f1:
        assert f1.read() == f0.read()


def test_checkpoint_sam_output(tmp_path):
    """-S + --checkpoint: resumed SAM text identical to the plain run."""
    if not os.path.exists(BAM):
        pytest.skip("test data missing")
    plain = str(tmp_path / "plain.sam")
    _run(_opts(out_bam_fn=plain, out_is_sam=True))
    ck = str(tmp_path / "ck")
    ck_sam = str(tmp_path / "ck.sam")
    _run(_opts(ck, out_bam_fn=ck_sam, out_is_sam=True))
    wins = sorted((f for f in os.listdir(ck) if f.startswith("win_")),
                  key=lambda f: int(f[4:-4]))
    for v in wins[len(wins) // 2:]:
        os.unlink(os.path.join(ck, v))
    res = str(tmp_path / "res.sam")
    _run(_opts(ck, out_bam_fn=res, out_is_sam=True))
    with open(plain) as f0, open(ck_sam) as f1, open(res) as f2:
        t0, t1, t2 = f0.read(), f1.read(), f2.read()
    assert t1 == t0
    assert t2 == t0


def test_checkpoint_composes_with_shard(tmp_path, monkeypatch):
    """--shard i/n + --checkpoint: each shard resumes independently and the
    merged body equals the unsharded run."""
    if not os.path.exists(BAM):
        pytest.skip("test data missing")
    full_n, full_vcf = _run(_opts())
    bodies = []
    for si in range(2):
        ck = str(tmp_path / f"ck{si}")
        opt = _opts(ck, shard=f"{si}/2")
        _run(opt)                       # populate the checkpoint

        def boom(*a, **k):
            raise AssertionError("window recomputed on shard resume")

        monkeypatch.setattr(pipeline, "call_window", boom)
        _, vcf = _run(opt)              # full replay
        monkeypatch.undo()
        bodies.extend(l for l in vcf.splitlines()
                      if l and not l.startswith("#"))
    full_body = [l for l in full_vcf.splitlines()
                 if l and not l.startswith("#")]
    assert sorted(bodies) == sorted(full_body)


@pytest.mark.parametrize("seed", range(4))
def test_kill_and_resume_anywhere(tmp_path, fresh, monkeypatch, seed):
    """Interrupt the run at a random window boundary (simulating a kill);
    the resume must produce a byte-identical VCF."""
    import numpy as np

    n0, vcf0 = fresh
    ck = str(tmp_path / f"ck{seed}")
    rng = np.random.default_rng(seed)
    kill_after = int(rng.integers(0, 4))
    seen = {"n": 0}
    real = pipeline.call_window

    class Boom(RuntimeError):
        pass

    def dying(opt, chunk):
        if seen["n"] >= kill_after:
            raise Boom()
        seen["n"] += 1
        return real(opt, chunk)

    monkeypatch.setattr(pipeline, "call_window", dying)
    with pytest.raises(Boom):
        _run(_opts(ck))
    monkeypatch.undo()
    n1, vcf1 = _run(_opts(ck))
    assert n1 == n0
    assert vcf1 == vcf0


# ---------------- procs-path checkpointing ----------------

def _opts_procs(ckpt=None, **kw):
    """Many 10 kb windows so run_call routes to the process pool."""
    return CallOpts.hifi(ref_fa_fn=REF, in_bam_fns=[BAM], regions=REGIONS,
                         window_size=10_000, checkpoint_dir=ckpt,
                         n_threads=4, use_device=False, **kw)


@pytest.fixture(scope="module")
def fresh_procs():
    if not os.path.exists(BAM):
        pytest.skip("test data missing")
    return _run(_opts_procs())


def test_procs_checkpoint_matches_fresh(tmp_path, fresh_procs, monkeypatch):
    """Checkpointing must not change the procs path's output, and the
    pool must actually be engaged (round-4 review item 9 wants
    checkpointing ON the procs pipeline)."""
    calls = []
    real = pipeline._run_call_procs

    def spy(opt, out, wins, n_workers, bams=None):
        calls.append(len(wins))
        return real(opt, out, wins, n_workers, bams)

    monkeypatch.setattr(pipeline, "_run_call_procs", spy)
    n0, vcf0 = fresh_procs
    n1, vcf1 = _run(_opts_procs(str(tmp_path / "ckp")))
    assert calls, "procs path not engaged; widen the window stream"
    assert (n1, vcf1) == (n0, vcf0)


def test_procs_kill_and_resume_anywhere(tmp_path, fresh_procs, monkeypatch):
    """Kill the procs consumer after a random number of window saves; the
    resume must replay the done prefix and produce a byte-identical
    VCF."""
    import numpy as np

    from longcalld_tpu.utils.checkpoint import Checkpoint

    n0, vcf0 = fresh_procs
    for seed in (0, 1):
        ck = str(tmp_path / f"ckk{seed}")
        rng = np.random.default_rng(seed)
        kill_after = int(rng.integers(1, 8))
        seen = {"n": 0}
        real = Checkpoint.save_procs_state

        class Boom(RuntimeError):
            pass

        def dying(self, *a, **k):
            if seen["n"] >= kill_after:
                raise Boom()
            seen["n"] += 1
            return real(self, *a, **k)

        monkeypatch.setattr(Checkpoint, "save_procs_state", dying)
        with pytest.raises(Boom):
            _run(_opts_procs(ck))
        monkeypatch.undo()
        n1, vcf1 = _run(_opts_procs(ck))
        assert (n1, vcf1) == (n0, vcf0), f"seed {seed}"


def test_checkpoint_cross_mode_resume(tmp_path, fresh_procs):
    """A directory written by the sequential path resumes under the procs
    path (and the output matches): the npz schema is shared."""
    n0, vcf0 = fresh_procs
    ck = str(tmp_path / "ckx")
    # sequential partial run over the same plan (kill after a few windows)
    opt_seq = _opts_procs(ck)
    import dataclasses
    opt_seq = dataclasses.replace(opt_seq, n_threads=1, host_procs=0)
    from longcalld_tpu.utils.checkpoint import Checkpoint
    real = Checkpoint.save

    class Stop(RuntimeError):
        pass

    seen = {"n": 0}

    def dying(self, *a, **k):
        if seen["n"] >= 5:
            raise Stop()
        seen["n"] += 1
        return real(self, *a, **k)

    Checkpoint.save = dying
    try:
        with pytest.raises(Stop):
            _run(opt_seq)
    finally:
        Checkpoint.save = real
    n1, vcf1 = _run(_opts_procs(ck))
    assert (n1, vcf1) == (n0, vcf0)
