"""Hash-range-sharded seed index (SURVEY.md §2.4 / §7 "index sharded by
k-mer-hash range across devices, candidate hits routed with collectives").

The replicated index is right whenever the table fits one HBM (yeast and
human both do on v5e); this module is the scale-out path for genomes whose
(hash, position) table does not.  Design:

* the SeedTable's hash-sorted arrays shard by ROWS over the mesh's data
  axis — contiguous row ranges of a hash-sorted array ARE hash ranges, so
  `jax.device_put` with a `P("data")` sharding is the whole partitioner;
* lookup runs where the data lives: every device resolves all reads'
  queried minimizers against its local slice (a bucket that straddles a
  shard boundary contributes its parts from both owners, in hash-array
  order, so concatenation preserves the reference's position-ascending
  bucket order);
* the global occupancy cap (kmer_max_occurence, seed_pos_table.cpp:314)
  needs the TOTAL bucket count — one psum over the (B, mq) count matrix;
* hits route to the device that owns the READ with one tiled all_to_all
  (read-block split axis 0, hit concat axis 1), after which the
  bin-sort/count/anchor stage (shared `_hits_post`) runs read-sharded and
  communication-free.

Tie-breaking: the reference stable-sorts hits by (bin<<32|offset) with
insertion order (minimizer ordinal, bucket slot) breaking ties.  Equal
(bin, offset) pairs always come from one minimizer's bucket, whose
positions concatenate in shard order = position order, so the sharded sort
is bit-identical to the replicated one (verified by test).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from darwin_tpu.seeding import dsoft as D


def shard_seed_table(table, mesh: Mesh, axis: str = "data"):
    """Place the seed table's hash-sorted arrays row-sharded over the mesh
    (rows of a hash-sorted array = contiguous hash ranges).  Pads the row
    count to a multiple of the axis size with +inf-like sentinel rows
    (hash 0xFFFFFFFF never matches a 2k-bit masked query hash for k<16)."""
    n = int(np.prod(list(mesh.shape.values())))
    N = table.num_seeds
    Npad = -(-max(N, 1) // n) * n
    hashes = np.asarray(table.sorted_hashes)
    pos = np.asarray(table.positions)
    if Npad != N:
        hashes = np.concatenate(
            [hashes, np.full(Npad - N, 0xFFFFFFFF, np.uint32)])
        pos = np.concatenate([pos, np.zeros(Npad - N, np.uint32)])
    sh = NamedSharding(mesh, P(axis))
    return (jax.device_put(jnp.asarray(hashes), sh),
            jax.device_put(jnp.asarray(pos), sh))


@functools.cache
def _sharded_fn(mesh: Mesh, axis: str, k, w, num_seeds, max_stride,
                overlap, threshold, bin_size, max_occ, mq_cap, a_cap):
    from jax.experimental.shard_map import shard_map

    def step(codes2, lengths, hashes_l, pos_l):
        offs, qhash, slot_ok = D._queried_minimizers(
            codes2, lengths, k, w, num_seeds, max_stride, overlap, mq_cap)
        start = jnp.searchsorted(hashes_l, qhash,
                                 side="left").astype(jnp.int32)
        end = jnp.searchsorted(hashes_l, qhash,
                               side="right").astype(jnp.int32)
        cnt_global = jax.lax.psum(end - start, axis)
        binf, offf, posf, okf, bucket_ok = D._bucket_hits(
            hashes_l, pos_l, offs, qhash, cnt_global, slot_ok,
            max_occ, bin_size)
        # route hits to the read's owner: split the read axis, concatenate
        # the hit axis (source-device order = hash order)
        binf = jax.lax.all_to_all(binf, axis, 0, 1, tiled=True)
        offf = jax.lax.all_to_all(offf, axis, 0, 1, tiled=True)
        posf = jax.lax.all_to_all(posf, axis, 0, 1, tiled=True)
        okf = jax.lax.all_to_all(okf, axis, 0, 1, tiled=True)
        # bucket_ok depends only on the psum'd global count, so it is
        # identical on every device — route and keep one copy per read
        nqb = jnp.sum(bucket_ok.astype(jnp.int32), axis=1)
        nqb = jax.lax.all_to_all(nqb[:, None], axis, 0, 1, tiled=True)[:, 0]
        return D._hits_post(binf, offf, posf, okf, nqb, k, threshold,
                            a_cap)

    out_specs = {kk: P(axis) for kk in
                 ("hits_bin", "hits_off", "hits_pos", "n_hits", "anc_pos",
                  "anc_off", "anc_bin", "n_anchors", "n_anchors_raw",
                  "n_queried_buckets")}
    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=out_specs, check_rep=False))


def dsoft_sharded(mesh: Mesh, codes2, lengths, hashes_sharded, pos_sharded,
                  *, k, w, num_seeds, max_stride, overlap, threshold,
                  bin_size, max_occ, mq_cap, a_cap, axis: str = "data"):
    """Hash-sharded D-SOFT; same result contract as dsoft.dsoft_device
    with the hit width multiplied by the mesh size (each read's hits
    gather contributions from every shard).  The read batch B must be a
    multiple of the mesh size."""
    fn = _sharded_fn(mesh, axis, k, w, num_seeds, max_stride, overlap,
                     threshold, bin_size, max_occ, mq_cap, a_cap)
    return fn(jnp.asarray(codes2), jnp.asarray(lengths),
              hashes_sharded, pos_sharded)
