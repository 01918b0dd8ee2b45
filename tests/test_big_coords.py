""">2 Gbp coordinate-space mechanics, testable small: force the chunked
2-D genome buffer (dispatch.chunk_ref_codes with a tiny chunk size) and
verify the whole pipeline's output is byte-identical to the 1-D path.
Locks the uint32 two-level gather, the uint32 request packing, and the
chunk-boundary-straddling tile windows (tools/bigref_e2e.py exercises the
same code at real 3.2 Gbp scale on the chip)."""

import numpy as np
import pytest

from darwin_tpu.config import Config
from darwin_tpu.genome import GenomeStore, make_read
from darwin_tpu.ops import dispatch
from darwin_tpu.pipeline.align import Aligner
from darwin_tpu.utils.simulate import simulate_reads


def test_chunked_ref_pipeline_identical(rng, monkeypatch):
    cfg = Config()
    cfg.seed_size = 10
    cfg.dsoft_threshold = 20
    cfg.min_overlap = 400
    store = GenomeStore()
    store.add_chromosome(
        "chrA", rng.choice(list(b"ACGT"), size=20000).astype(np.uint8))
    store.add_chromosome(
        "chrB", rng.choice(list(b"ACGT"), size=15000).astype(np.uint8))
    store.finalize()
    sim = simulate_reads(store, 8, 1500, seed=6)
    reads = [make_read(n, s) for n, s, _ in sim]

    single = Aligner(cfg, store).align_batch(reads)

    # force chunking: 16 KiB chunks, every tile window may straddle one
    monkeypatch.setattr(dispatch, "CHUNK_BITS", 14)
    monkeypatch.setattr(dispatch, "CHUNK_ELEMS", 1 << 14)
    real_chunk = dispatch.chunk_ref_codes

    def tiny_chunk(codes):
        n = -(-codes.shape[0] // dispatch.CHUNK_ELEMS)
        pad = n * dispatch.CHUNK_ELEMS - codes.shape[0]
        if pad:
            codes = np.concatenate([codes, np.full(pad, 4, np.uint8)])
        return codes.reshape(n, dispatch.CHUNK_ELEMS)

    monkeypatch.setattr(dispatch, "chunk_ref_codes", tiny_chunk)
    chunked = Aligner(cfg, store).align_batch(reads)
    assert chunked == single
    assert len(single) >= 4
    assert real_chunk(np.zeros(8, np.uint8)).ndim == 1  # small stays 1-D
