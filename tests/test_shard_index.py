"""Hash-range-sharded seed index vs the replicated D-SOFT.

Runs on the 8-device virtual CPU mesh (conftest).  The sharded path's hit
buffers are wider (one slot block per shard) and the invalid tail differs,
but every VALID hit, every anchor, and every count must be identical —
including tie order, which the whole D-SOFT/chain pipeline depends on.
"""

import numpy as np
import jax.numpy as jnp

from darwin_tpu.config import Config
from darwin_tpu.genome import GenomeStore
from darwin_tpu.index.seed_table import build_seed_table
from darwin_tpu.parallel.shard import make_mesh
from darwin_tpu.parallel.shard_index import shard_seed_table, dsoft_sharded
from darwin_tpu.seeding.dsoft import dsoft_device, mq_cap_for
from darwin_tpu import genome as G
from tests.conftest import random_codes


def test_sharded_dsoft_matches_replicated(rng):
    cfg = Config()
    cfg.num_seeds = 64
    k, w = cfg.seed_size, cfg.minimizer_window

    # genome with embedded repeats so buckets are non-trivial
    core = random_codes(rng, 40000, n_prob=0)
    genome = np.concatenate([core, core[:8000], random_codes(rng, 12000,
                                                             n_prob=0)])
    bases = np.frombuffer(b"ACGT", np.uint8)[genome]
    store = GenomeStore()
    store.add_chromosome("c1", bases[:35000])
    store.add_chromosome("c2", bases[35000:])
    store.finalize()
    table = build_seed_table(store, cfg)

    B = 8
    L = 2048
    codes2 = np.zeros((B, L), np.uint8)
    lengths = np.zeros(B, np.int32)
    for b in range(B):
        ln = int(rng.integers(900, L))
        start = int(rng.integers(0, len(genome) - ln))
        codes2[b, :ln] = genome[start:start + ln]
        lengths[b] = ln

    mq_cap = mq_cap_for(L - k + 1, cfg.num_seeds, cfg.max_stride, False)
    max_occ = table.kmer_max_occurence
    kw = dict(k=k, w=w, num_seeds=cfg.num_seeds, max_stride=cfg.max_stride,
              overlap=False, threshold=cfg.dsoft_threshold,
              bin_size=cfg.bin_size, max_occ=max_occ, mq_cap=mq_cap,
              a_cap=2048)

    ref = dsoft_device(jnp.asarray(codes2), jnp.asarray(lengths),
                       table.sorted_hashes, table.positions, **kw)
    mesh = make_mesh(8)
    st = shard_seed_table(table, mesh)
    got = dsoft_sharded(mesh, codes2, lengths, st,
                        hit_cap=mq_cap * max_occ, **kw)

    for key in ("n_hits", "n_anchors", "n_anchors_raw",
                "n_queried_buckets"):
        np.testing.assert_array_equal(np.asarray(ref[key]),
                                      np.asarray(got[key]), err_msg=key)
    for b in range(B):
        n = int(ref["n_hits"][b])
        for key in ("hits_bin", "hits_off", "hits_pos"):
            np.testing.assert_array_equal(
                np.asarray(ref[key])[b, :n], np.asarray(got[key])[b, :n],
                err_msg=f"{key} read {b}")
        na = int(ref["n_anchors"][b])
        for key in ("anc_pos", "anc_off", "anc_bin"):
            np.testing.assert_array_equal(
                np.asarray(ref[key])[b, :na], np.asarray(got[key])[b, :na],
                err_msg=f"{key} read {b}")
    assert int(np.asarray(ref["n_hits"]).sum()) > 0
    assert int(np.asarray(ref["n_anchors"]).sum()) > 0


def test_sharded_index_pipeline_identical(rng):
    """Production-path end-to-end: Aligner(mesh, shard_index=True) — the
    Seeder running the hash-sharded flat-gather D-SOFT — must emit output
    byte-identical to the single-device pipeline."""
    from darwin_tpu.genome import make_read
    from darwin_tpu.pipeline.align import Aligner
    from darwin_tpu.utils.simulate import simulate_reads

    cfg = Config()
    cfg.seed_size = 10
    cfg.dsoft_threshold = 20
    cfg.min_overlap = 400
    store = GenomeStore()
    store.add_chromosome(
        "chrA", np.frombuffer(b"ACGT", np.uint8)[
            random_codes(rng, 15000, n_prob=0)])
    store.finalize()
    sim = simulate_reads(store, 6, 1500, seed=4)
    reads = [make_read(n, s) for n, s, _ in sim]

    single = Aligner(cfg, store).align_batch(reads)
    mesh = make_mesh(8)
    sharded = Aligner(cfg, store, mesh=mesh,
                      shard_index=True).align_batch(reads)
    assert single == sharded
    assert len(single) >= 4


def test_sharded_hit_cap_retry(rng):
    """A too-small initial hit_cap must transparently retry to the
    lossless result (the Seeder's overflow loop through n_flat_raw)."""
    from darwin_tpu.seeding.seeder import Seeder
    from darwin_tpu.genome import make_read
    from darwin_tpu.utils.simulate import simulate_reads

    cfg = Config()
    cfg.seed_size = 10
    cfg.dsoft_threshold = 20
    store = GenomeStore()
    core = random_codes(rng, 6000, n_prob=0)
    rep = np.concatenate([core, core[:3000], core[:3000]])
    store.add_chromosome("chrA", np.frombuffer(b"ACGT", np.uint8)[rep])
    store.finalize()
    from darwin_tpu.index.seed_table import build_seed_table
    table = build_seed_table(store, cfg)
    sim = simulate_reads(store, 4, 1200, seed=5)
    reads = [make_read(n, s) for n, s, _ in sim]

    mesh = make_mesh(8)
    a = Seeder(table, cfg).seed_batch(reads)
    b = Seeder(table, cfg, hit_cap=8, mesh=mesh).seed_batch(reads)

    def eq(xs, ys):
        assert len(xs) == len(ys)
        for x, y in zip(xs, ys):
            assert (x.hit, x.offset, x.num_chained_hits,
                    x.anchor_score) == (y.hit, y.offset,
                                        y.num_chained_hits, y.anchor_score)
            np.testing.assert_array_equal(x.left_chained, y.left_chained)
            np.testing.assert_array_equal(x.right_chained, y.right_chained)

    for x, y in zip(a.fw_anchors, b.fw_anchors):
        eq(x, y)
    for x, y in zip(a.rc_anchors, b.rc_anchors):
        eq(x, y)
