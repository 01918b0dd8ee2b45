"""Golden lock for overlap (de-novo) mode + index checkpoint roundtrip."""

import hashlib

import numpy as np
import pytest

from darwin_tpu.config import Config
from darwin_tpu.genome import GenomeStore, make_read
from darwin_tpu.index.seed_table import SeedTable, build_seed_table
from darwin_tpu.io.fasta import load_genome
from darwin_tpu.pipeline.align import Aligner

REF = "/root/reference/software/data/sample_ref.fa"
GOLDEN_SHA = "eeb552468628308e6c617e7dacfd3f6a14caa80805a6ac923283289de62e0d8e"


def _world():
    store = load_genome(REF)
    rng = np.random.default_rng(9)
    c0 = store.chromosomes[0]
    base = store.bases[c0.start + 50000:c0.start + 60000]

    def noisy(sl):
        sl = sl.copy()
        m = rng.random(len(sl)) < 0.03
        sl[m] = rng.choice(list(b"ACGT"), size=m.sum())
        return sl

    reads = [make_read("rA", noisy(base[0:4000])),
             make_read("rB", noisy(base[2000:6500])),
             make_read("rC", noisy(base[5000:9500]))]
    rs = GenomeStore()
    for r in reads:
        rs.add_chromosome(r.name, r.seq)
    rs.finalize()
    return reads, rs


def test_golden_overlap_mhap():
    cfg = Config()
    cfg.do_overlap = True
    reads, rs = _world()
    aligner = Aligner(cfg, rs)
    lines = aligner.align_batch(reads)
    body = "".join(lines)
    sha = hashlib.sha256(body.encode()).hexdigest()
    assert sha == GOLDEN_SHA, f"golden mismatch: {sha}\n{body[:1500]}"
    # sanity of the actual records: rA-rB and rB-rC overlap, rA-rC doesn't
    recs = [l.split() for l in lines if l[0] == "r" and " " in l]
    pairs = {(r[0], r[1]) for r in recs}
    assert ("rA", "rB") in pairs and ("rB", "rC") in pairs
    assert ("rA", "rC") not in pairs


def test_index_checkpoint_roundtrip(tmp_path):
    cfg = Config()
    cfg.do_overlap = True
    reads, rs = _world()
    t1 = build_seed_table(rs, cfg)
    p = str(tmp_path / "idx.npz")
    t1.save(p)
    t2 = SeedTable.load(p)
    np.testing.assert_array_equal(np.asarray(t1.sorted_hashes),
                                  np.asarray(t2.sorted_hashes))
    np.testing.assert_array_equal(np.asarray(t1.positions),
                                  np.asarray(t2.positions))
    assert (t2.kmer_size, t2.minimizer_window, t2.ref_size,
            t2.kmer_max_occurence) == (t1.kmer_size, t1.minimizer_window,
                                       t1.ref_size, t1.kmer_max_occurence)
    a1 = Aligner(cfg, rs, table=t1).align_batch(reads)
    a2 = Aligner(cfg, rs, table=t2).align_batch(reads)
    assert a1 == a2
