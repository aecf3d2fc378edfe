"""Adversarial ONT synthetic battery: each ONT-specific knob gets a scene
engineered so the test FAILS if the knob is broken.

Knobs covered (reference provenance):
* Fisher strand-bias gate        collect_var.c:270-296
* 67% homopolymer consensus rule assign_hap.c:264
* palindrome-clip suppression    bam_utils.c:642-698, 773-774
* 25 bp ONT noisy sliding window call_var_main.h:30-32

The real ONT HG002 BAM is absent from the reference snapshot
(.MISSING_LARGE_BLOBS), so these scenes are the adversarial synthetic
substitute: strand-skewed coverage that makes a forward-only artifact
look haplotype-consistent, a het deletion in a 20 bp A-run planted at
within-hap fractions straddling the 67% boundary, palindromic clips with
SA tags at/below the 90% overlap bar, and a mismatch field dense enough
for the HiFi 100 bp window but sparse for the ONT 25 bp one.
"""

import io

import numpy as np
import pytest

from longcalld_tpu.config import CallOpts
from longcalld_tpu.core.digar import collect_digar_eqx
from longcalld_tpu.core.pipeline import call_window, load_chunk, run_call
from longcalld_tpu.core.windows import plan_windows
from longcalld_tpu.io.bam import (BamReader, BamRecord, CEQUAL, CSOFT_CLIP)
from longcalld_tpu.io.fasta import FastaFile

from util_bam import make_record, sim_read, write_bam, z_tag


def _write_fasta(path, name, seq4):
    with open(path, "w") as f:
        f.write(f">{name}\n")
        s = "".join("ACGTN"[b] for b in seq4)
        for i in range(0, len(s), 60):
            f.write(s[i:i + 60] + "\n")
    with open(path + ".fai", "w") as f:
        f.write(f"{name}\t{len(s)}\t{len(name) + 2}\t60\t61\n")


def _call(ref_fa, bam, preset="ont", **kw):
    ctor = CallOpts.ont if preset == "ont" else CallOpts.hifi
    L = FastaFile(ref_fa).seq_len("chrT")
    opt = ctor(ref_fa_fn=ref_fa, in_bam_fns=[bam], use_device=False,
               regions=[f"chrT:1-{L}"], **kw)
    buf = io.StringIO()
    run_call(opt, buf, "ont-adv")
    return [l for l in buf.getvalue().splitlines() if not l.startswith("#")]


# ---------------- Fisher strand-bias gate ----------------

@pytest.fixture(scope="module")
def strand_bias_scene(tmp_path_factory):
    """48 ONT reads; hap2 coverage strand-skewed 20 fwd / 4 rev; an
    'artifact' SNV rides every forward hap2 read -> alt strands (20, 0),
    Fisher p=4e-4 < 0.01, yet within hap2 it is an 83% majority — a
    broken gate calls it 0|1."""
    d = tmp_path_factory.mktemp("sb")
    L = 6000
    rng = np.random.default_rng(9)
    ref4 = rng.integers(0, 4, L).astype(np.uint8)
    _write_fasta(str(d / "ref.fa"), "chrT", ref4)
    het1 = {p: ("snv", (int(ref4[p]) + 1) % 4, "het1")
            for p in (900, 2200, 3600, 5000)}
    art, art_alt = 3000, (int(ref4[3000]) + 2) % 4
    recs = []
    for j in range(24):                       # hap1: 12 fwd + 12 rev
        seq, cig = sim_read(rng, ref4, 0, L, 1, dict(het1), 0.0)
        recs.append(make_record(0, 0, f"a{j:03d}", cig, seq,
                                np.full(len(seq), 30, np.uint8),
                                flag=16 if j % 2 else 0))
    for j in range(24):                       # hap2: 20 fwd + 4 rev
        fwd = j < 20
        v = dict(het1)
        if fwd:
            v[art] = ("snv", art_alt, "het2")
        seq, cig = sim_read(rng, ref4, 0, L, 2, v, 0.0)
        recs.append(make_record(0, 0, f"b{j:03d}", cig, seq,
                                np.full(len(seq), 30, np.uint8),
                                flag=0 if fwd else 16))
    bam = str(d / "r.bam")
    write_bam(bam, ["chrT"], [L], recs)
    return str(d / "ref.fa"), bam, art, het1


def test_strand_bias_gate_drops_artifact(strand_bias_scene):
    ref_fa, bam, art, het1 = strand_bias_scene
    body = _call(ref_fa, bam)
    assert not any(int(l.split("\t")[1]) == art + 1 for l in body), \
        "strand-pure artifact leaked past the Fisher gate"
    ctrl = [l for l in body if int(l.split("\t")[1]) - 1 in het1]
    assert len(ctrl) == len(het1)
    assert all(l.split("\t")[9].startswith(("0|1", "1|0")) for l in ctrl)


def test_strand_bias_gate_broken_calls_artifact(strand_bias_scene):
    """Disable the gate (pval=0 can never exceed a p-value): the artifact
    IS called — proving the scene exercises the gate, not something else."""
    ref_fa, bam, art, _ = strand_bias_scene
    body = _call(ref_fa, bam, strand_bias_pval=0.0)
    arts = [l for l in body if int(l.split("\t")[1]) == art + 1]
    assert arts and arts[0].split("\t")[9].startswith(("0|1", "1|0"))


def test_strand_bias_gate_is_ont_only(strand_bias_scene):
    """The reference applies the Fisher gate only under --ont
    (collect_var.c:913 call chain); HiFi calls the same site."""
    ref_fa, bam, art, _ = strand_bias_scene
    body = _call(ref_fa, bam, preset="hifi")
    assert any(int(l.split("\t")[1]) == art + 1 for l in body)


# ---------------- 67% homopolymer-indel consensus rule ----------------

@pytest.fixture(scope="module")
def hp67_scenes(tmp_path_factory):
    """A 20 bp A-run with a het 1 bp deletion planted on hap2 reads at
    90% and 55% within-hap support (both majorities; only one clears the
    ONT 67% bar)."""
    d = tmp_path_factory.mktemp("hp67")
    L = 8000
    rng = np.random.default_rng(5)
    ref4 = rng.integers(0, 4, L).astype(np.uint8)
    ref4[4000:4020] = 0                        # the homopolymer field
    ref4[3999], ref4[4020] = 2, 3
    ref_fa = str(d / "ref.fa")
    _write_fasta(ref_fa, "chrT", ref4)
    het1 = {p: ("snv", (int(ref4[p]) + 1) % 4, "het1")
            for p in (1000, 2500, 6000, 7000)}
    het2 = {p: ("snv", (int(ref4[p]) + 1) % 4, "het2")
            for p in (1800, 5200)}
    anchor = 4004
    bams = {}
    for frac in (0.9, 0.55):
        recs = []
        n_del = round(frac * 20)
        for hap in (1, 2):
            for j in range(20):
                v = dict(het1)
                v.update(het2)
                if hap == 2 and j < n_del:
                    v[anchor] = ("del", 1, "het2")
                seq, cig = sim_read(rng, ref4, 0, L, hap, v, 0.0)
                recs.append(make_record(
                    0, 0, f"r{hap}{j:02d}", cig, seq,
                    np.full(len(seq), 30, np.uint8),
                    flag=16 if j % 2 else 0))
        bam = str(d / f"f{int(frac * 100)}.bam")
        write_bam(bam, ["chrT"], [L], recs)
        bams[frac] = bam
    return ref_fa, bams, anchor


def _del_calls(body, anchor):
    out = []
    for l in body:
        f = l.split("\t")
        if (abs(int(f[1]) - (anchor + 1)) <= 25
                and len(f[3]) - len(f[4]) == 1):
            out.append(f)
    return out


def test_hp67_majority_above_bar_called(hp67_scenes):
    ref_fa, bams, anchor = hp67_scenes
    dels = _del_calls(_call(ref_fa, bams[0.9]), anchor)
    assert dels, "90% within-hap homopolymer del must be called under ONT"
    gt = dels[0][9].split(":")[0]
    assert gt in ("0|1", "1|0")


def test_hp67_majority_below_bar_suppressed(hp67_scenes):
    ref_fa, bams, anchor = hp67_scenes
    assert not _del_calls(_call(ref_fa, bams[0.55]), anchor), \
        "55% < 67% within-hap support must not reach consensus under ONT"


def test_hp67_rule_is_ont_only(hp67_scenes):
    """HiFi has no 67% bar — a simple 55% majority makes consensus, so the
    same BAM under --hifi calls the del (the broken-knob detector)."""
    ref_fa, bams, anchor = hp67_scenes
    dels = _del_calls(_call(ref_fa, bams[0.55], preset="hifi"), anchor)
    assert dels and dels[0][9].split(":")[0] in ("0|1", "1|0")


# ---------------- palindrome (inverted-duplicate) clips ----------------

def _pal_read(ref4, tags, flag):
    """1000 bp aligned + 200 bp soft clip whose sequence is the inverted
    complement of the preceding aligned tail (the ONT palindrome
    artifact's shape)."""
    pos0, aln, clip = 500, 1000, 200
    seq = np.concatenate([
        ref4[pos0:pos0 + aln],
        3 - ref4[pos0 + aln - clip:pos0 + aln][::-1]]).astype(np.uint8)
    raw = make_record(0, pos0, "pal", [(CEQUAL, aln), (CSOFT_CLIP, clip)],
                      seq, np.full(len(seq), 30, np.uint8), flag=flag,
                      tags=tags)
    return BamRecord(raw)


@pytest.fixture(scope="module")
def pal_ref():
    rng = np.random.default_rng(3)
    return rng.integers(0, 4, 3000).astype(np.uint8)


def test_palindrome_sa_suppresses_clip_noise(pal_ref):
    """An SA entry overlapping >=90% of the primary span marks the read
    palindromic: its clipped side is hard-clipped and contributes NO
    long-clip noisy flank (bam_utils.c:773-788)."""
    opt = CallOpts.ont(ref_fa_fn="x", in_bam_fns=["y"])
    sa = z_tag("SA", "chrT,531,-,970M200S,60,0;")       # 97% overlap
    _, regions, pal = collect_digar_eqx(_pal_read(pal_ref, sa, 0), opt,
                                        1, 3000, 3000, pal_ref, 0)
    assert pal and regions == []


def test_no_sa_long_clip_is_noisy(pal_ref):
    opt = CallOpts.ont(ref_fa_fn="x", in_bam_fns=["y"])
    _, regions, pal = collect_digar_eqx(_pal_read(pal_ref, b"", 0), opt,
                                        1, 3000, 3000, pal_ref, 0)
    assert not pal and len(regions) == 1   # the >=30 bp clip flank


def test_palindrome_needs_90pct_overlap(pal_ref):
    """SA overlapping only ~40% of the primary span is an ordinary
    supplementary, not a palindrome (check_ont_palindrome's 0.9 bar)."""
    opt = CallOpts.ont(ref_fa_fn="x", in_bam_fns=["y"])
    sa = z_tag("SA", "chrT,1101,-,400M200S,60,0;")
    _, regions, pal = collect_digar_eqx(_pal_read(pal_ref, sa, 0), opt,
                                        1, 3000, 3000, pal_ref, 0)
    assert not pal and len(regions) == 1


def test_palindrome_side_follows_strand(pal_ref):
    """Reverse-strand palindromes suppress the LEFT clip only
    (bam_utils.c:676-683): our read's clip is on the right, so a reverse
    palindrome still flags the right-clip noisy flank."""
    opt = CallOpts.ont(ref_fa_fn="x", in_bam_fns=["y"])
    sa = z_tag("SA", "chrT,531,+,970M200S,60,0;")
    _, regions, pal = collect_digar_eqx(_pal_read(pal_ref, sa, 16), opt,
                                        1, 3000, 3000, pal_ref, 0)
    assert pal and len(regions) == 1


def test_palindrome_detection_is_ont_only(pal_ref):
    opt = CallOpts.hifi(ref_fa_fn="x", in_bam_fns=["y"])
    sa = z_tag("SA", "chrT,531,-,970M200S,60,0;")
    _, regions, pal = collect_digar_eqx(_pal_read(pal_ref, sa, 0), opt,
                                        1, 3000, 3000, pal_ref, 0)
    assert not pal and len(regions) == 1


# ---------------- 25 bp ONT noisy sliding window ----------------

@pytest.fixture(scope="module")
def window_scene(tmp_path_factory):
    """Six hom SNVs 15 bp apart on every read: 6 X in 90 bp exceeds the
    HiFi >5-per-100bp density, but no 25 bp window holds more than 2 —
    ONT (>5 per 25 bp) must treat the field as clean variants."""
    d = tmp_path_factory.mktemp("nw")
    L = 6000
    rng = np.random.default_rng(4)
    ref4 = rng.integers(0, 4, L).astype(np.uint8)
    ref_fa = str(d / "ref.fa")
    _write_fasta(ref_fa, "chrT", ref4)
    field = {2000 + 15 * k: ("snv", (int(ref4[2000 + 15 * k]) + 1) % 4,
                             "hom") for k in range(6)}
    recs = []
    for k in range(20):
        seq, cig = sim_read(rng, ref4, 0, L, 1 + k % 2, dict(field), 0.0)
        recs.append(make_record(0, 0, f"r{k:03d}", cig, seq,
                                np.full(len(seq), 30, np.uint8),
                                flag=16 if k % 2 else 0))
    bam = str(d / "r.bam")
    write_bam(bam, ["chrT"], [L], recs)
    return ref_fa, bam, sorted(field)


def _window_chunk(ref_fa, bam, preset):
    ctor = CallOpts.ont if preset == "ont" else CallOpts.hifi
    L = FastaFile(ref_fa).seq_len("chrT")
    opt = ctor(ref_fa_fn=ref_fa, in_bam_fns=[bam], use_device=False,
               regions=[f"chrT:1-{L}"])
    fasta = FastaFile(opt.ref_fa_fn)
    bams = [BamReader(fn) for fn in opt.in_bam_fns]
    wins = plan_windows(opt, bams[0].references, bams[0].lengths)
    chunk = load_chunk(opt, fasta, bams, wins[0], None, None)
    call_window(opt, chunk)
    return chunk


def test_ont_25bp_window_keeps_spread_field_clean(window_scene):
    ref_fa, bam, field = window_scene
    chunk = _window_chunk(ref_fa, bam, "ont")
    assert chunk.noisy_regs is None or len(chunk.noisy_regs) == 0
    body = _call(ref_fa, bam)
    called = {int(l.split("\t")[1]) - 1 for l in body}
    assert set(field) <= called, "spread hom SNVs lost under ONT"


def test_hifi_100bp_window_flags_same_field_noisy(window_scene):
    """The same BAM under HiFi trips the 100 bp density window — the scene
    fails if the preset's slide-window plumbing is broken."""
    ref_fa, bam, field = window_scene
    chunk = _window_chunk(ref_fa, bam, "hifi")
    regs = list(chunk.noisy_regs) if chunk.noisy_regs is not None else []
    assert any(s <= field[0] + 1 and e >= field[-1] + 1
               for s, e, *_ in regs), f"no noisy region spans the field: {regs}"
