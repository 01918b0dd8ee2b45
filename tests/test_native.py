"""Native C++ components vs their Python fallbacks (identical results)."""

import numpy as np
import pytest

from darwin_tpu import native
from darwin_tpu.config import Config
from darwin_tpu.ops import oracle as orc
from darwin_tpu.pipeline.extend import _Ext

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_fasta_scan(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">chr1 description here\nACGT\nACGTN\n>chr2\nTTTT\n")
    names, seqs = native.fasta_scan_native(p.read_bytes())
    assert names == ["chr1", "chr2"]
    assert seqs[0].tobytes() == b"ACGTACGTN"
    assert seqs[1].tobytes() == b"TTTT"


def test_chain_native_matches_python(rng):
    from darwin_tpu.seeding import chain as C
    import os
    for trial in range(6):
        n = int(rng.integers(5, 200))
        bins = np.sort(rng.integers(0, 30, n)).astype(np.int32)
        offs = np.zeros(n, np.int32)
        # offsets ascending within equal bins (device-sort invariant)
        for b in np.unique(bins):
            m = bins == b
            offs[m] = np.sort(rng.integers(0, 500, m.sum())).astype(np.int32)
        poss = (bins.astype(np.int64) * 64 + offs
                + rng.integers(0, 64, n)).astype(np.int32)
        # anchors: a few hits picked as anchors (bin-ascending)
        idx = np.sort(rng.choice(n, size=min(4, n), replace=False))
        ap, ao, ab = poss[idx], offs[idx], bins[idx]

        got = C.chain_anchors(bins, offs, poss, n, ap, ao, ab, len(idx),
                              64, False)
        os.environ["DARWIN_TPU_NO_NATIVE"] = "1"
        try:
            native._tried = False
            native._lib = None
            want = C.chain_anchors(bins, offs, poss, n, ap, ao, ab,
                                   len(idx), 64, False)
        finally:
            del os.environ["DARWIN_TPU_NO_NATIVE"]
            native._tried = False
            native._lib = None
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g.hit == w.hit and g.offset == w.offset
            assert g.num_chained_hits == w.num_chained_hits
            assert g.anchor_score == w.anchor_score
            assert g.left_chained.tolist() == w.left_chained.tolist()
            assert g.right_chained.tolist() == w.right_chained.tolist()


def test_decode_ops_native_matches_numpy(rng):
    cfg = Config()
    bases = rng.choice(list(b"ACGT"), size=2000).astype(np.uint8)
    qbytes = rng.choice(list(b"ACGT"), size=1200).astype(np.uint8)
    for trial in range(20):
        n = int(rng.integers(0, 150))
        ops = rng.choice([orc.OP_M, orc.OP_I, orc.OP_D],
                         p=[0.7, 0.15, 0.15], size=n).astype(np.uint8)
        stop_thr = int(rng.integers(5, 100))
        direction = trial % 2
        curr_ref = int(rng.integers(0, 900))
        curr_q = int(rng.integers(0, 700))
        ref_len, q_len = 1000, 800
        got = native.decode_ops_native(ops, stop_thr, direction, bases, 100,
                                       qbytes, curr_ref, curr_q, ref_len,
                                       q_len)
        # numpy replication
        ext = object.__new__(_Ext)
        a = ext._applied_ops(ops, stop_thr)
        rc_ = a != orc.OP_I
        qc_ = a != orc.OP_D
        k_ref = np.cumsum(rc_) - rc_
        k_q = np.cumsum(qc_) - qc_
        dash = np.uint8(ord("-"))
        if direction == 0:
            pr = np.maximum(curr_ref - k_ref, 0)
            pq = np.maximum(curr_q - k_q, 0)
            nr = max(curr_ref - int(rc_.sum()), 0)
            nq = max(curr_q - int(qc_.sum()), 0)
            rb = int(rc_.sum()) >= curr_ref + 1
            qb = int(qc_.sum()) >= curr_q + 1
        else:
            pr = np.minimum(curr_ref + k_ref, ref_len)
            pq = np.minimum(curr_q + k_q, q_len)
            nr = min(curr_ref + int(rc_.sum()), ref_len)
            nq = min(curr_q + int(qc_.sum()), q_len)
            rb = qb = False
        rch = np.where(rc_, bases[100 + pr], dash)
        qch = np.where(qc_, qbytes[pq], dash)
        assert got[0].tolist() == rch.tolist(), trial
        assert got[1].tolist() == qch.tolist(), trial
        assert (got[2], got[3]) == (nr, nq), trial
        assert (got[4], got[5]) == (rb, qb), trial


def test_pipeline_output_invariant_to_decode_path(rng, monkeypatch):
    """End-to-end SAM output must be identical across the three traceback
    decode paths: batched native (wave), per-tile native, pure NumPy."""
    from darwin_tpu.config import Config
    from darwin_tpu.genome import GenomeStore, make_read
    from darwin_tpu.pipeline.align import Aligner
    from darwin_tpu.utils.simulate import simulate_reads

    store = GenomeStore()
    bases = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 120000)]
    store.add_chromosome("c1", bases)
    store.finalize()
    cfg = Config()
    sim = simulate_reads(store, 6, 4000, seed=11)
    reads = [make_read(n, s) for n, s, _ in sim]

    base = Aligner(cfg, store).align_batch(reads)

    monkeypatch.setattr(native, "decode_ops_batch_native",
                        lambda *a, **k: None)
    per_tile = Aligner(cfg, store).align_batch(reads)
    assert per_tile == base

    monkeypatch.setattr(native, "decode_ops_native", lambda *a, **k: None)
    numpy_path = Aligner(cfg, store).align_batch(reads)
    assert numpy_path == base
