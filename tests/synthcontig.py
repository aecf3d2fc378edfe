"""Large synthetic diploid contig with a planted truth set + F1 evaluator.

Scales to tens of megabases where tests/util_bam.sim_read (per-base
Python) cannot: haplotype sequences are built by numpy segment stitching,
reads are slices of the haplotype with vectorized mismatch-error
injection, and the read-vs-reference CIGAR comes from a run-length
hap-to-ref map sliced per read (no per-base work).  Reads carry M CIGARs
(no =/X, no MD), so the pipeline's ref-compare digar source
(/root/reference/src/bam_utils.c:1176-1327 analog) recomputes the
mismatches — planted variants AND injected errors — from the reference,
exactly as it would for a minimal real-world BAM.

Used by bench.py (F1 leg on a multi-megabase contig), tests/test_f1_synth
(small-scale), and tests/soak.py (f1 family).

Truth classes for scoring: snv, indel (<50 bp), sv (>= 50 bp).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

from util_bam import make_record, write_bam

CMATCH, CINS, CDEL, CSOFT = 0, 1, 2, 4

# (kind, gt) per truth record: kind snv/ins/del; gt het1/het2/hom


def build_truth(rng: np.random.Generator, ref4: np.ndarray, beg: int,
                end: int, snv_per_kb: float = 1.0,
                indel_per_kb: float = 0.125, sv_per_mb: float = 5.0,
                min_gap: int = 150) -> List[tuple]:
    """Plant variants at realistic human-ish densities over [beg, end):
    returns sorted [(pos, kind, payload, gt)] with payload = alt base
    (snv) / base list (ins) / deletion length (del).  SVs are ins/del of
    50-400 bp; small indels 1-12 bp."""
    span = end - beg
    n_snv = rng.poisson(snv_per_kb * span / 1000)
    n_ind = rng.poisson(indel_per_kb * span / 1000)
    n_sv = rng.poisson(sv_per_mb * span / 1e6)
    events = []
    for _ in range(n_snv):
        events.append(("snv", None))
    for _ in range(n_ind):
        events.append(("ins" if rng.random() < 0.5 else "del",
                       int(rng.integers(1, 13))))
    for _ in range(n_sv):
        events.append(("ins" if rng.random() < 0.5 else "del",
                       int(rng.integers(50, 401))))
    rng.shuffle(events)
    pos_pool = np.sort(rng.choice(
        np.arange(beg + 200, end - 600, dtype=np.int64),
        size=min(len(events), max(0, (end - beg - 800) // min_gap)),
        replace=False))
    # enforce min_gap between consecutive sites (vectorized prune)
    keep = np.ones(len(pos_pool), dtype=bool)
    last = -10**18
    for i, p in enumerate(pos_pool):
        if p - last < min_gap:
            keep[i] = False
        else:
            last = p
    pos_pool = pos_pool[keep]
    truth = []
    for pos, (kind, ln) in zip(pos_pool, events):
        pos = int(pos)
        gt = ("hom" if rng.random() < 0.35
              else ("het1" if rng.random() < 0.5 else "het2"))
        if kind == "snv":
            payload = (int(ref4[pos]) + 1 + int(rng.integers(3))) % 4
        elif kind == "ins":
            payload = rng.integers(0, 4, ln).astype(np.uint8)
        else:
            ln = min(ln, 120) if ln < 50 else ln   # dels bounded by gap
            if ln >= min_gap - 30:
                ln = min_gap - 30
            payload = int(ln)
        truth.append((pos, kind, payload, gt))
    return truth


class HapMap:
    """One haplotype: stitched sequence + run-length hap-to-ref map."""

    def __init__(self, ref4: np.ndarray, beg: int, end: int,
                 truth: List[tuple], hap: int):
        segs: List[np.ndarray] = []
        ops: List[int] = []
        lens: List[int] = []          # length in hap coords (I/M) or ref (D)
        cur = beg

        def push(op, ln):
            if ln <= 0:
                return
            if ops and ops[-1] == op:
                lens[-1] += ln
            else:
                ops.append(op)
                lens.append(ln)

        for pos, kind, payload, gt in truth:
            on = gt == "hom" or (gt == "het1") == (hap == 1)
            if not on or pos < cur:
                continue
            segs.append(ref4[cur:pos])
            push(CMATCH, pos - cur)
            if kind == "snv":
                segs.append(np.array([payload], dtype=np.uint8))
                push(CMATCH, 1)
                cur = pos + 1
            elif kind == "ins":
                segs.append(ref4[pos:pos + 1])
                push(CMATCH, 1)
                segs.append(np.asarray(payload, dtype=np.uint8))
                push(CINS, len(payload))
                cur = pos + 1
            else:
                segs.append(ref4[pos:pos + 1])
                push(CMATCH, 1)
                push(CDEL, int(payload))
                cur = pos + 1 + int(payload)
        segs.append(ref4[cur:end])
        push(CMATCH, end - cur)
        self.seq = np.concatenate(segs) if segs else np.zeros(0, np.uint8)
        self.ops = np.asarray(ops, dtype=np.int64)
        self.lens = np.asarray(lens, dtype=np.int64)
        hap_consumed = np.where(self.ops == CDEL, 0, self.lens)
        ref_consumed = np.where(self.ops == CINS, 0, self.lens)
        self.cum_hap = np.concatenate([[0], np.cumsum(hap_consumed)])
        self.cum_ref = np.concatenate([[0], np.cumsum(ref_consumed)])
        self.beg = beg                 # ref coord of hap position 0

    def read_cigar(self, s: int, e: int) -> Tuple[int, list]:
        """CIGAR (list of (op, len)) and 0-based ref start for the read
        covering hap coords [s, e)."""
        i = int(np.searchsorted(self.cum_hap, s, side="right")) - 1
        j = int(np.searchsorted(self.cum_hap, e, side="left"))
        cig = []
        ref_pos = None
        for k in range(i, j):
            op = int(self.ops[k])
            ln = int(self.lens[k])
            h0 = int(self.cum_hap[k])
            if op != CDEL:
                lo = max(s, h0)
                hi = min(e, h0 + ln)
                if hi <= lo:
                    continue
                if ref_pos is None:
                    off = lo - h0
                    ref_pos = (self.beg + int(self.cum_ref[k])
                               + (off if op == CMATCH else 0))
                    if op == CINS:
                        # a read starting inside an insertion: soft-clip
                        # the leading inserted bases so POS stays on ref
                        cig.append([CSOFT, hi - lo])
                        continue
                cig.append([op, hi - lo])
            else:
                if ref_pos is None or s >= e:
                    continue
                if cig and s < e:
                    cig.append([CDEL, ln])
        # merge adjacent same-op runs
        out = []
        for op, ln in cig:
            if out and out[-1][0] == op:
                out[-1][1] += ln
            else:
                out.append([op, ln])
        # trailing DEL is illegal; drop it
        while out and out[-1][0] == CDEL:
            out.pop()
        while out and out[0][0] == CDEL:
            ref_pos += out[0][1]
            out.pop(0)
        return ref_pos, [(op, ln) for op, ln in out]


def apply_ont_errors(seq: np.ndarray, cig: List[tuple],
                     rng: np.random.Generator, indel_rate: float
                     ) -> Tuple[np.ndarray, List[tuple]]:
    """Inject ONT-style 1-2 bp indel errors into a read: error sites are
    biased into homopolymer context (the dominant real ONT error mode and
    the reason for the reference's 67% homopolymer-majority consensus
    rule, /root/reference/src/assign_hap.c:264), implemented as
    insertions duplicating the local base or 1 bp deletions inside M
    runs."""
    n_err = rng.poisson(indel_rate * len(seq))
    if n_err == 0:
        return seq, cig
    # read positions currently consumed by M runs
    spans = []
    r = 0
    for op, ln in cig:
        if op == CMATCH:
            spans.append((r, r + ln))
            r += ln
        elif op in (CINS, CSOFT):
            r += ln
    if not spans:
        return seq, cig
    lo = np.array([s for s, _ in spans])
    hi = np.array([e for _, e in spans])
    pool = rng.integers(0, len(seq), 4 * n_err)
    in_m = pool[((pool[:, None] >= lo[None, :])
                 & (pool[:, None] < hi[None, :])).any(axis=1)]
    if len(in_m) == 0:
        return seq, cig
    # homopolymer bias: keep a site with p=0.9 if its 3-neighborhood is a
    # run of one base, else p=0.25
    keep = []
    for p in in_m[:2 * n_err]:
        p = int(p)
        s = seq[max(0, p - 1):p + 2]
        hp = len(s) >= 2 and (s == s[0]).all()
        if rng.random() < (0.9 if hp else 0.25):
            keep.append(p)
        if len(keep) >= n_err:
            break
    events = sorted({p: ("ins" if rng.random() < 0.55 else "del",
                         1 + int(rng.random() < 0.3))
                     for p in keep}.items())
    return _apply_indel_events(seq, cig, events)


def _read_m_spans(seq, cig):
    spans = []
    r = 0
    for op, ln in cig:
        if op == CMATCH:
            spans.append((r, r + ln))
            r += ln
        elif op in (CINS, CSOFT):
            r += ln
    return spans


def apply_ont_errors_r10(seq: np.ndarray, cig: List[tuple],
                         rng: np.random.Generator, indel_rate: float
                         ) -> Tuple[np.ndarray, List[tuple]]:
    """Second, independently-parameterized ONT error model (round-4
    review item 7: de-correlate the ONT e2e from the model its author
    also wrote).  R10.4.1-style profile: indel errors concentrate in
    homopolymer RUNS with probability growing in run length, and
    deletions dominate insertions — the documented nanopore error
    structure (Delahaye & Nicolas 2021, PLoS ONE 16:e0257521: indels
    overwhelmingly in homopolymers, deletion-biased; ONT R10.4 chemistry
    notes report the same deletion-dominated homopolymer tail).
    Constants: per-run length-error probability p(L) = min(0.45,
    0.01 * 2^(L-4)) for runs of length L >= 4 (fixed published-shape
    constants — ``indel_rate`` only scales the uniform non-HP background
    at 0.4*indel_rate), 65% deletions / 35% insertions (vs the first
    model's per-SITE placement, 55% insertion bias, and flat homopolymer
    keep-probability).  Event application shares only the
    CIGAR splicing plumbing (_apply_indel_events)."""
    spans = _read_m_spans(seq, cig)
    if not spans:
        return seq, cig
    events = {}
    # homopolymer-run scan inside M spans; per-run length-error
    # probability follows the published R10-style shape — roughly
    # doubling per extra base, negligible at 4-mers, saturating at long
    # runs (Delahaye & Nicolas 2021 Fig 5-ish shape; R10.4.1 basecaller
    # evaluations report ~1% at 4-mers rising to tens of percent only
    # past ~8-10 bp).  Deliberately NOT budget-calibrated: inflating
    # short-run probabilities to hit a per-base target produces
    # unrealistically correlated errors (measured: 36% per-read error at
    # 4-mers, which no chemistry has).
    runs = []
    for lo, hi in spans:
        p = lo
        while p < hi:
            b = seq[p]
            q = p + 1
            while q < hi and seq[q] == b:
                q += 1
            if q - p >= 4:
                runs.append((p, q - p))
            p = q
    for p, L in runs:
        prob = min(0.45, 0.01 * (2.0 ** (L - 4)))
        if rng.random() < prob:
            site = p + int(rng.integers(1, L))
            if rng.random() < 0.65:
                events[site] = ("del", 1)
            else:
                events[site] = ("ins", 1)
    # uniform background (non-HP) at 40% of the nominal budget
    n_bg = rng.poisson(0.4 * indel_rate * len(seq))
    lo = np.array([a for a, _ in spans])
    hi = np.array([b for _, b in spans])
    pool = rng.integers(0, len(seq), max(4 * n_bg, 1))
    in_m = pool[((pool[:, None] >= lo[None, :])
                 & (pool[:, None] < hi[None, :])).any(axis=1)]
    for p in in_m[:n_bg]:
        events.setdefault(int(p), ("del" if rng.random() < 0.65 else "ins",
                                   1))
    return _apply_indel_events(seq, cig, sorted(events.items()))


def _apply_indel_events(seq: np.ndarray, cig: List[tuple], events
                        ) -> Tuple[np.ndarray, List[tuple]]:
    """Splice (read_pos -> ins/del) error events into a read's seq+CIGAR
    (shared by both ONT error models; a deletion may neither start the
    alignment nor end an M run)."""
    out_cig: List[list] = []
    out_seq: List[np.ndarray] = []
    r = 0
    ei = 0

    def push(op, ln):
        if ln <= 0:
            return
        if out_cig and out_cig[-1][0] == op:
            out_cig[-1][1] += ln
        else:
            out_cig.append([op, ln])

    for op, ln in cig:
        if op not in (CMATCH,):
            push(op, ln)
            if op in (CINS, CSOFT):
                out_seq.append(seq[r:r + ln])
                r += ln
            continue
        run_end = r + ln
        cur = r
        while ei < len(events) and events[ei][0] < run_end:
            p, (kind, el) = events[ei]
            ei += 1
            if p < cur:
                continue
            if kind == "ins":
                out_seq.append(seq[cur:p + 1])
                push(CMATCH, p + 1 - cur)
                out_seq.append(np.full(el, seq[p], dtype=np.uint8))
                push(CINS, el)
                cur = p + 1
            else:
                if p + 1 >= run_end:
                    continue    # deletion may not end a run
                if p == cur and not any(o == CMATCH for o, _ in out_cig):
                    continue    # a deletion may not START the alignment
                out_seq.append(seq[cur:p])
                push(CMATCH, p - cur)
                push(CDEL, 1)
                cur = p + 1
        out_seq.append(seq[cur:run_end])
        push(CMATCH, run_end - cur)
        r = run_end
    new_seq = (np.concatenate(out_seq) if out_seq
               else np.zeros(0, np.uint8))
    return new_seq, [(op, ln) for op, ln in out_cig]


def write_synth_bam(path: str, tname: str, ref_len: int, ref4: np.ndarray,
                    truth: List[tuple], beg: int, end: int,
                    coverage: float = 20.0, read_len: int = 12_000,
                    err: float = 0.003, seed: int = 0,
                    qual: int = 35, indel_err: float = 0.0,
                    error_model: str = "v1", extra_refs=None) -> int:
    """Write a sorted BAM of diploid reads over [beg, end); returns the
    number of reads.  ``indel_err`` > 0 adds ONT-style indel errors:
    ``error_model="v1"`` is the per-site homopolymer-biased model
    (apply_ont_errors); ``"r10"`` is the independently-parameterized
    run-length/deletion-dominated profile (apply_ont_errors_r10)."""
    rng = np.random.default_rng(seed)
    haps = [HapMap(ref4, beg, end, truth, 1), HapMap(ref4, beg, end,
                                                     truth, 2)]
    recs = []
    n_reads_per_hap = int(coverage * (end - beg) / read_len / 2)
    for h, hm in enumerate(haps):
        hl = len(hm.seq)
        starts = np.sort(rng.integers(0, max(1, hl - read_len),
                                      n_reads_per_hap))
        for k, s in enumerate(starts):
            s = int(s)
            e = min(s + read_len, hl)
            seq = hm.seq[s:e].copy()
            n_err = rng.poisson(err * len(seq))
            if n_err:
                idx = rng.choice(len(seq), min(n_err, len(seq)),
                                 replace=False)
                seq[idx] = (seq[idx] + 1
                            + rng.integers(0, 3, len(idx))) % 4
            ref_pos, cig = hm.read_cigar(s, e)
            if ref_pos is None or not cig:
                continue
            if indel_err > 0:
                fn = (apply_ont_errors_r10 if error_model == "r10"
                      else apply_ont_errors)
                seq, cig = fn(seq, cig, rng, indel_err)
            # consumed-length consistency
            q_len = sum(ln for op, ln in cig if op in (CMATCH, CINS, CSOFT))
            if q_len != len(seq):
                seq = seq[:q_len]
                if len(seq) < q_len:
                    continue
            recs.append((ref_pos, make_record(
                0, ref_pos, f"s{h+1}_{k:06d}", cig, seq,
                np.full(len(seq), qual, dtype=np.uint8), mapq=60,
                flag=16 if (k % 4) >= 2 else 0)))
    recs.sort(key=lambda r: r[0])
    names, lens = [tname], [ref_len]
    for en, el in (extra_refs or []):
        names.append(en)
        lens.append(el)
    write_bam(path, names, lens, [r[1] for r in recs])
    # true random access: bench/procs workers fetch only their window
    # spans instead of inflating the whole file (io/bam.build_bai)
    from longcalld_tpu.io.bam import build_bai
    build_bai(path)
    return len(recs)


def write_synth_fasta(path: str, tname, ref4) -> None:
    """Write a FASTA (+.fai).  ``tname``/``ref4`` may be lists for a
    multi-contig file (the WGS bench leg adds a read-free contig to
    demonstrate index-driven window skipping at scale)."""
    tnames = tname if isinstance(tname, (list, tuple)) else [tname]
    refs = ref4 if isinstance(ref4, (list, tuple)) else [ref4]
    nt = np.array([65, 67, 71, 84, 78], dtype=np.uint8)  # ACGTN
    fai = []
    off_bytes = 0
    with open(path, "wb") as fh:
        for tn, r4 in zip(tnames, refs):
            ascii_seq = nt[r4]
            hdr = f">{tn}\n".encode()
            fh.write(hdr)
            off_bytes += len(hdr)
            fai.append(f"{tn}\t{len(ascii_seq)}\t{off_bytes}\t60\t61\n")
            for off in range(0, len(ascii_seq), 60):
                fh.write(ascii_seq[off:off + 60].tobytes() + b"\n")
            off_bytes += len(ascii_seq) + (len(ascii_seq) + 59) // 60
    with open(path + ".fai", "w") as fh:
        fh.writelines(fai)


NT4 = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 4}


def _norm_indel(ref_str: str, alt_str: str):
    """Strip the shared anchor base; returns (kind, payload_len, seq)."""
    if len(alt_str) > len(ref_str):
        return "ins", len(alt_str) - len(ref_str)
    return "del", len(ref_str) - len(alt_str)


def _left_norm_del(ref4: np.ndarray, anchor: int, ln: int) -> int:
    """Canonical (leftmost) anchor for a deletion of ref[anchor+1 ..
    anchor+ln]: shift left while the base entering the deleted window
    from the left equals the one leaving it on the right."""
    s = anchor + 1
    while s > 1 and ref4[s - 1] == ref4[s + ln - 1]:
        s -= 1
    return s - 1


def _left_norm_ins(ref4: np.ndarray, anchor: int, seq) -> int:
    """Canonical (leftmost) anchor for an insertion after ``anchor``:
    rotate the inserted sequence left past equal reference bases."""
    seq = list(np.asarray(seq)) if not isinstance(seq, int) else None
    a = anchor
    if seq is None:
        return a
    k = 0
    while a > 0 and ref4[a] == seq[(len(seq) - 1 - k) % len(seq)]:
        a -= 1
        k += 1
    return a


def evaluate_f1(vcf_body: List[str], truth: List[tuple],
                beg: int, end: int, ref4: np.ndarray = None,
                sv_pos_tol: int = 60,
                sv_len_tol: float = 0.25,
                return_fns: bool = False) -> Dict[str, dict]:
    """Score called records against the planted truth.

    snv: exact pos + alt base.  indel (<50): kind + length at the
    LEFT-NORMALIZED position (the caller left-aligns gaps, so planted and
    called anchors differ by homopolymer/repeat shifts that are pure
    representation, not errors — the same reason hap.py-style truth
    comparison normalizes).  sv (>=50): pos within sv_pos_tol, kind
    match, length within sv_len_tol.
    Returns {class: {tp, fp, fn, precision, recall, f1}}."""
    def clas(kind, payload):
        if kind == "snv":
            return "snv"
        ln = payload if isinstance(payload, int) else len(payload)
        return "sv" if ln >= 50 else "indel"

    truth_in = [(p, k, pl, gt) for p, k, pl, gt in truth if beg <= p < end]
    t_by_class: Dict[str, list] = {"snv": [], "indel": [], "sv": []}
    for p, k, pl, gt in truth_in:
        t_by_class[clas(k, pl)].append((p, k, pl))
    calls: Dict[str, list] = {"snv": [], "indel": [], "sv": []}
    for ln_ in vcf_body:
        if ln_.startswith("#"):
            continue
        f = ln_.split("\t")
        pos1 = int(f[1])
        ref_s, alt_s = f[3], f[4].split(",")[0]
        if len(ref_s) == 1 and len(alt_s) == 1:
            calls["snv"].append((pos1 - 1, NT4.get(alt_s.upper(), 4)))
        else:
            kind, ln = _norm_indel(ref_s, alt_s)
            a = pos1 - 1
            if ref4 is not None:
                if kind == "ins":
                    seq = [NT4.get(c, 4) for c in alt_s[1:].upper()]
                    a = _left_norm_ins(ref4, a, seq)
                else:
                    a = _left_norm_del(ref4, a, ln)
            calls["sv" if ln >= 50 else "indel"].append((a, kind, ln))
    out = {}
    fns: Dict[str, list] = {"snv": [], "indel": [], "sv": []}
    # snv: truth pos is 0-based planted position; VCF pos1-1 == pos
    t_snv = {(p, pl) for p, k, pl in t_by_class["snv"]}
    c_snv = set(calls["snv"])
    tp = len(t_snv & c_snv)
    out["snv"] = _prf(tp, len(c_snv) - tp, len(t_snv) - tp)
    fns["snv"] = sorted(t_snv - c_snv)
    # indel: left-normalized anchor + kind + length on both sides
    t_ind = set()
    for p, k, pl in t_by_class["indel"]:
        ln = pl if isinstance(pl, (int, np.integer)) else len(pl)
        a = p
        if ref4 is not None:
            a = (_left_norm_ins(ref4, p, pl) if k == "ins"
                 else _left_norm_del(ref4, p, int(pl)))
        t_ind.add((a, k, int(ln)))
    c_ind = set(calls["indel"])
    tp = len(t_ind & c_ind)
    out["indel"] = _prf(tp, len(c_ind) - tp, len(t_ind) - tp)
    fns["indel"] = sorted(t_ind - c_ind)
    # sv: fuzzy match
    t_sv = [(p, k, pl if isinstance(pl, int) else len(pl))
            for p, k, pl in t_by_class["sv"]]
    used = [False] * len(t_sv)
    tp = 0
    fp = 0
    for cp, ck, cl in calls["sv"]:
        hit = False
        for i, (p, k, ln) in enumerate(t_sv):
            if used[i] or k != ck:
                continue
            if abs(cp - p) <= sv_pos_tol and \
                    abs(cl - ln) <= sv_len_tol * max(cl, ln):
                used[i] = True
                tp += 1
                hit = True
                break
        if not hit:
            fp += 1
    out["sv"] = _prf(tp, fp, len(t_sv) - tp)
    fns["sv"] = sorted(t for t, u in zip(t_sv, used) if not u)
    if return_fns:
        return out, fns
    return out


def _prf(tp: int, fp: int, fn: int) -> dict:
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": round(p, 4),
            "recall": round(r, 4), "f1": round(f1, 4)}
