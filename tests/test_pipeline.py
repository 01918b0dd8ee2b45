"""End-to-end pipeline tests on a small synthetic genome plus unit checks of
extender quirks against literal transcriptions of the C++ loops."""

import io
import re

import numpy as np
import pytest

from darwin_tpu.config import Config
from darwin_tpu.genome import GenomeStore
from darwin_tpu.ops import oracle as orc
from darwin_tpu.pipeline.align import Aligner
from darwin_tpu.pipeline.extend import (_Ext, ExtendAlignment,
                                        alignment_score)
from darwin_tpu.pipeline.filter import ExtendLocation
from darwin_tpu.utils.simulate import simulate_reads
from darwin_tpu.genome import make_read


def pipeline_cfg():
    cfg = Config()
    # small-genome-friendly D-SOFT (defaults need k=14 tables; fine but
    # slower to build in tests), keep GACT defaults
    cfg.seed_size = 10
    cfg.dsoft_threshold = 20
    cfg.bin_size = 64
    cfg.min_overlap = 400
    return cfg


@pytest.fixture(scope="module")
def small_world():
    rng = np.random.default_rng(42)
    store = GenomeStore()
    store.add_chromosome("chrA",
                         rng.choice(list(b"ACGT"), size=20000).astype(np.uint8))
    store.add_chromosome("chrB",
                         rng.choice(list(b"ACGT"), size=9000).astype(np.uint8))
    store.finalize()
    return store


def test_end_to_end_sam(small_world):
    cfg = pipeline_cfg()
    store = small_world
    sim = simulate_reads(store, 8, 2000, seed=1)
    reads = [make_read(n, s) for n, s, _ in sim]
    aligner = Aligner(cfg, store)
    lines = aligner.align_batch(reads)
    assert lines, "no alignments produced"

    mapped = {}
    for ln in lines:
        f = ln.rstrip("\n").split("\t")
        qname, flag, rname, pos, mapq, cigar = \
            f[0], int(f[1]), f[2], int(f[3]), int(f[4]), f[5]
        assert mapq == 60
        assert flag & 64
        # CIGAR consumes exactly the read
        ops = re.findall(r"(\d+)([SMID])", cigar)
        qlen = sum(int(n) for n, op in ops if op in "SMI")
        read = next(r for r in reads if r.name == qname)
        assert qlen == read.length, (qname, cigar)
        if qname not in mapped:
            mapped[qname] = (rname, pos, "-" if flag & 16 else "+", cigar)

    truth = {n: t for n, _, t in sim}
    hits = 0
    for qname, (rname, pos, strand, cigar) in mapped.items():
        chr_name, start0, true_strand = truth[qname]
        if rname == chr_name and strand == true_strand:
            # primary alignment position within a few hundred bp of truth
            if abs((pos - 1) - start0) < 500 or true_strand == "-":
                hits += 1
    assert hits >= len(mapped) * 0.8
    assert len(mapped) >= 6  # most reads align


def test_end_to_end_overlap_mode(small_world):
    """De-novo overlap mode: reads vs reads."""
    cfg = pipeline_cfg()
    cfg.do_overlap = True
    cfg.min_overlap = 500
    rng = np.random.default_rng(3)
    # two overlapping reads from chrA + one unrelated
    base = small_world.bases[
        small_world.chromosomes[0].start:small_world.chromosomes[0].start + 6000]
    r1 = base[0:3000]
    r2 = base[1500:4500]
    r3 = rng.choice(list(b"ACGT"), size=3000).astype(np.uint8)
    reads = [make_read("r1", r1), make_read("r2", r2), make_read("r3", r3)]

    read_store = GenomeStore()
    for r in reads:
        read_store.add_chromosome(r.name, r.seq)
    read_store.finalize()
    aligner = Aligner(cfg, read_store)
    lines = aligner.align_batch(reads)
    recs = [l for l in lines if not set(l.strip()) <= set("ACGTN-")]
    assert any(l.startswith("r1 r2") or l.startswith("r2 r1") for l in recs)
    assert not any("r3" in l.split()[:2] and ("r1" in l.split()[:2]
                                              or "r2" in l.split()[:2])
                   for l in recs)


def _applied_ops_literal(ops, stop_thr):
    """Literal transcription of the decode loop (extender.cpp:280-331)."""
    out = []
    num = 0
    total = len(ops)
    for t in range(0, total, 32):
        num_p = min(total - t, 32)
        for p in range(num_p):
            op = ops[t + p]
            out.append(op)
            num += 1
            if num >= stop_thr and op == orc.OP_M:
                break
    return out


def test_applied_ops_quirk(rng):
    ext = object.__new__(_Ext)
    for trial in range(30):
        n = int(rng.integers(0, 120))
        ops = rng.choice([orc.OP_M, orc.OP_I, orc.OP_D],
                         p=[0.7, 0.15, 0.15], size=n).astype(np.uint8)
        thr = int(rng.integers(1, 80))
        got = ext._applied_ops(ops, thr).tolist()
        assert got == _applied_ops_literal(list(ops), thr), (n, thr)


def _alignment_score_literal(ref, q, cfg):
    """Literal transcription of AlignmentScore (extender.cpp:1161-1200)."""
    score = 0
    open_ = 0
    sgp = 0
    lgp = 0
    sub5 = cfg.sub_matrix_5x5
    code = {**{c: i for i, c in enumerate("ACGT")}, "N": 4, "-": 5}
    for r, qq in zip(ref, q):
        if r == "-" or qq == "-":
            sgp += cfg.gap_extend if open_ else cfg.gap_open
            lgp += cfg.long_gap_extend if open_ else cfg.long_gap_open
            open_ = 1
        else:
            rn, qn = code.get(r.upper(), 4), code.get(qq.upper(), 4)
            if rn <= 3 and qn <= 3:
                score += sub5[qn][rn]
            else:
                score += cfg.gact_sub_mat[10]
            score += max(sgp, lgp)
            open_ = 0
            sgp = 0
            lgp = 0
    return score


def test_alignment_score_matches_literal(rng):
    cfg = Config()
    alpha = list("ACGTN-")
    for trial in range(25):
        n = int(rng.integers(0, 60))
        ref = "".join(rng.choice(alpha, size=n))
        q = []
        for c in ref:
            q.append(rng.choice(list("ACGTN")) if c == "-"
                     else rng.choice(list("ACGTN-")))
        q = "".join(q)
        got = alignment_score(
            np.frombuffer(ref.encode(), np.uint8),
            np.frombuffer(q.encode(), np.uint8), cfg)
        assert got == _alignment_score_literal(ref, q, cfg), (ref, q)


def test_large_tile_escalation(small_world):
    """A read spanning a deletion wider than a standard 384 tile must
    escalate to the 1984x960 large-tile geometry (extender.cpp:353-394)
    and still produce the correct locus and a deletion-bearing CIGAR.
    Locks the trickiest branch of the extension state machine, previously
    only covered if a golden run wandered into it."""
    cfg = pipeline_cfg()
    store = small_world
    chrom = store.chromosomes[0]
    start = 5000
    left, dele, right = 2000, 1200, 2000
    s0 = int(chrom.start) + start
    seq = np.concatenate([
        store.bases[s0:s0 + left],
        store.bases[s0 + left + dele:s0 + left + dele + right]])
    reads = [make_read("sv_read", seq)]
    aligner = Aligner(cfg, store)
    lines = aligner.align_batch(reads)
    c = aligner.counters
    assert c["num_large_tiles"] > 0, c
    body = [ln for ln in lines if not ln.startswith("@")]
    assert len(body) >= 1
    f = body[0].split("\t")
    assert f[2] == chrom.name
    assert abs(int(f[3]) - (start + 1)) <= 16, f[3]
    cigar = f[5]
    import re
    # the gap may be split across the tile boundary (e.g. 768D 1M 432D) —
    # inherent to tiled crossing; the total deleted span must match
    dels = [int(x) for x in re.findall(r"(\d+)D", cigar)]
    assert dels and sum(dels) >= dele - 64, cigar
    matches = sum(int(x) for x in re.findall(r"(\d+)M", cigar))
    assert matches >= left + right - 64, cigar


def test_end_to_end_sam_csr_layout(small_world):
    """The csr seed-table layout must leave the e2e SAM byte-identical:
    the bucket-offset gathers replace the LUT bisect but the hit stream —
    and everything downstream — is the same."""
    from darwin_tpu.index.seed_table import build_seed_table

    cfg = pipeline_cfg()
    store = small_world
    sim = simulate_reads(store, 8, 2000, seed=5)
    reads = [make_read(n, s) for n, s, _ in sim]
    lines_pairs = Aligner(cfg, store).align_batch(reads)
    table = build_seed_table(store, cfg, layout="csr")
    lines_csr = Aligner(cfg, store, table=table).align_batch(reads)
    assert lines_pairs == lines_csr
    assert lines_pairs, "no alignments produced"


def test_mhap_error_rate_float_narrowing():
    """The MHAP error rate must round like the reference's float32
    narrowing (printer.cpp:166 `float error = (1.0*(ovl-matches))/ovl`):
    147/1200 is 0.12249999... in double ("0.122") but 0.12250000238 as
    float32 ("0.123").  Caught live by tools/denovo_e2e.py's reference-
    binary spot check."""
    from darwin_tpu.config import Config
    from darwin_tpu.genome import GenomeStore, make_read
    from darwin_tpu.pipeline import printer

    # ovl = (1194 + 1206)//2 = 1200; matches = 1053 of the 1206 aligned
    # columns (no indels in the aligned strings for simplicity)
    ral, qal = 1194, 1206
    alen = 1206
    matches = 1053
    ar = bytearray(b"A" * alen)
    aq = bytearray(b"A" * alen)
    for i in range(alen - matches):
        aq[i] = ord("C")
    store = GenomeStore()
    rng = np.random.default_rng(0)
    other = rng.choice(list(b"ACGT"), size=3000).astype(np.uint8)
    store.add_chromosome("refread", other)
    store.finalize()
    cfg = pipeline_cfg()
    cfg.do_overlap = True
    cfg.min_overlap = 400
    read = make_read("qread", other[:3000])
    al = ExtendAlignment(
        read_num=0, chr_id=0, strand="+",
        reference_start_offset=1789, query_start_offset=1,
        reference_end_offset=1789 + ral - 1,
        query_end_offset=1 + qal - 1,
        reference_length=2983, query_length=2996,
        aligned_reference=bytes(ar), aligned_query=bytes(aq), score=100)
    lines = printer.mhap_lines([al], [read], store, cfg)
    assert lines, "record suppressed"
    fields = lines[0].split()
    assert fields[2] == "0.123", lines[0]
