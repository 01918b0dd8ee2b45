"""Streaming index builds fed by device-resident packed rows == the host
row-upload path, bit for bit (ops/packed.gather_rows wiring)."""

import numpy as np
import jax.numpy as jnp

from darwin_tpu import genome as G
from darwin_tpu.config import Config
from darwin_tpu.index import minimizers as M
from darwin_tpu.ops.packed import device_packed


def _store(rng):
    store = G.GenomeStore()
    for name, n in (("c1", 40000), ("c2", 1300), ("c3", 17)):
        b = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n)
        nm = rng.random(n) < 0.01
        b[nm] = ord("N")
        store.add_chromosome(name, b)
    store.finalize()
    return store


def _seqs(store):
    return [(store.codes2[c.start:c.start + c.length], c.length_unpadded,
             c.start) for c in store.chromosomes]


def test_csr_build_packed_rows_identical(rng):
    store = _store(rng)
    cfg = Config()
    k, w = cfg.seed_size, cfg.minimizer_window
    packed_dev, _ = device_packed(store)
    off_h, pos_h, n_h, _ = M.build_csr_streaming(_seqs(store), k, w)
    off_p, pos_p, n_p, _ = M.build_csr_streaming(_seqs(store), k, w,
                                                 packed_dev=packed_dev)
    assert n_h == n_p
    assert (np.asarray(off_h) == np.asarray(off_p)).all()
    assert (np.asarray(pos_h) == np.asarray(pos_p)).all()


def test_streaming_pairs_packed_rows_identical(rng):
    store = _store(rng)
    cfg = Config()
    k, w = cfg.seed_size, cfg.minimizer_window
    packed_dev, _ = device_packed(store)
    cap = int(store.size * 2.4 / (w + 1)) + (1 << 16)
    sh_h, sp_h, n_h = M.scan_sorted_pairs_streaming(_seqs(store), k, w, cap)
    sh_p, sp_p, n_p = M.scan_sorted_pairs_streaming(
        _seqs(store), k, w, cap, packed_dev=packed_dev)
    assert n_h == n_p
    assert (np.asarray(sh_h) == np.asarray(sh_p)).all()
    assert (np.asarray(sp_h) == np.asarray(sp_p)).all()


def test_device_build_packed_rows_identical(rng):
    store = _store(rng)
    cfg = Config()
    k, w = cfg.seed_size, cfg.minimizer_window
    packed_dev, _ = device_packed(store)
    sh_h, sp_h = M.scan_sorted_pairs_device(_seqs(store), k, w)
    sh_p, sp_p = M.scan_sorted_pairs_device(_seqs(store), k, w,
                                            packed_dev=packed_dev)
    assert (np.asarray(sh_h) == np.asarray(sh_p)).all()
    assert (np.asarray(sp_h) == np.asarray(sp_p)).all()


def test_streamed_provider_multi_piece_identical(rng):
    """device_packed_streaming with tiny pieces (forcing the paste chain
    and per-batch ensure() calls) produces the same csr table as the
    one-shot device_packed upload."""
    from darwin_tpu.ops.packed import device_packed_streaming

    store = _store(rng)
    cfg = Config()
    k, w = cfg.seed_size, cfg.minimizer_window
    packed_dev, _ = device_packed(store)
    off_a, pos_a, n_a, _ = M.build_csr_streaming(
        _seqs(store), k, w, packed_dev=packed_dev)

    store2 = _store(np.random.default_rng(0))   # same seed as rng fixture
    provider = device_packed_streaming(store2, piece_bytes=1 << 12)
    seqs2 = [(None, c.length_unpadded, c.start)
             for c in store2.chromosomes]
    off_b, pos_b, n_b, _ = M.build_csr_streaming(
        seqs2, k, w, packed_dev=provider)
    assert n_a == n_b
    assert (np.asarray(off_a) == np.asarray(off_b)).all()
    assert (np.asarray(pos_a) == np.asarray(pos_b)).all()
    # provider memoized the completed pack on the store
    assert store2._packed_dev is not None
    assert store2._packed_stats["n_pieces"] >= 3


def test_bases_with_margin_memoized(rng):
    store = _store(rng)
    a = store.bases_with_margin(64)
    b = store.bases_with_margin(64)
    assert a is b
    assert len(a) == store.size + 64
    assert (a[-64:] == ord("N")).all()
    c = store.bases_with_margin(128)
    assert len(c) == store.size + 128
    # adding a chromosome invalidates the margin cache and the packed memo
    store.add_chromosome("late", np.full(40, ord("A"), np.uint8))
    assert store._bases_margin is None and store._packed_dev is None
    d = store.bases_with_margin(64)
    assert len(d) == store.size + 64
