"""Seeder stage: batched D-SOFT over reads, both strands.

Replaces seeder_body (software/seeder.cpp:6-47): instead of a
parallel_for_each over reads each calling a scalar DSOFT, all reads of a
batch (forward and reverse-complement rows together) go through ONE device
dispatch; chaining runs on the host per anchor.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp
import numpy as np

from darwin_tpu import genome as G
from darwin_tpu.index.seed_table import SeedTable
from darwin_tpu.seeding import chain
from darwin_tpu.seeding.dsoft import dsoft_count, dsoft_device, mq_cap_for


def _round_up_pow2(x: int, floor: int = 512) -> int:
    n = floor
    while n < x:
        n *= 2
    return n


@dataclasses.dataclass
class SeedResult:
    fw_anchors: List[List[chain.Anchor]]  # per read
    rc_anchors: List[List[chain.Anchor]]
    n_queried_buckets: int
    n_capped_buckets: int = 0    # queried buckets over kmer_max_occurence


class Seeder:
    def __init__(self, table: SeedTable, cfg, a_cap: int = 8192,
                 hit_cap: int | None = None, mesh=None):
        """mesh: optional jax.sharding.Mesh — shards the seed table by
        hash range across devices (parallel/shard_index.py) and runs the
        sharded D-SOFT, with hits routed to the read's owner by one tiled
        all_to_all.  Results are bit-identical to the replicated path.

        hit_cap default: 512 on the single-device path (the dsoft_count
        pre-pass sizes it exactly before the first fused dispatch, so a
        small floor never retries), 8192 on the mesh path, which still
        uses the overflow-retry loop — a 512 start there would pay extra
        retries and recompiles of the large sharded program."""
        self.table = table if mesh is not None else table.ensure_lut()
        self.cfg = cfg
        self.a_cap = a_cap
        self.hit_cap = hit_cap if hit_cap is not None else (
            8192 if mesh is not None else 512)
        self.max_occ = (cfg.max_bucket_occupancy
                        or table.kmer_max_occurence)
        self.mesh = mesh
        # optional stage-timing sink (Aligner shares its dict); sub-stage
        # keys: seed_dispatch (device program + count fetch), seed_fetch
        # (hit/anchor array fetch), seed_chain (host chaining)
        self.stage_seconds: dict | None = None
        if mesh is not None:
            if table.bucket_offsets is not None:
                raise ValueError(
                    "hash-sharded seeding partitions the sorted-pair "
                    "layout; build the table with layout='pairs' for "
                    "mesh=... (csr is the single-chip big-table answer)")
            from darwin_tpu.parallel.shard_index import shard_seed_table
            self.sharded_table = shard_seed_table(table, mesh)
            n = self.sharded_table.n_shards
            if n & (n - 1):
                raise ValueError("mesh size must be a power of two")
        else:
            self.sharded_table = None

    def seed_batch(self, reads, stage_seconds: dict | None = None
                   ) -> SeedResult:
        """stage_seconds: per-call timing sink (pipelined callers pass a
        local dict and merge; falls back to the shared attribute)."""
        import time as _time
        tacc = stage_seconds if stage_seconds is not None \
            else self.stage_seconds
        _t = _time.perf_counter

        def mark(key, t0):
            if tacc is not None:
                tacc[key] = tacc.get(key, 0.0) + _t() - t0
            return _t()

        cfg = self.cfg
        if not reads:
            return SeedResult([], [], 0)
        t0 = _t()
        max_len = max(r.length for r in reads)
        lcap = _round_up_pow2(((max_len + 15) // 16) * 16)
        # pad the row count too: a ragged final read batch would otherwise
        # compile its own (B, lcap) program variant
        B = _round_up_pow2(2 * len(reads), 8)
        codes2 = np.zeros((B, lcap), np.uint8)
        lengths = np.zeros(B, np.int32)
        for i, r in enumerate(reads):
            codes2[2 * i, :r.length] = G.encode2(r.seq)
            codes2[2 * i + 1, :r.length] = G.encode2(r.rc_seq)
            lengths[2 * i] = lengths[2 * i + 1] = r.length

        if self.mesh is not None:
            # every shard needs the same row count; B is a power of two,
            # so max() covers any power-of-two mesh
            B2 = max(B, self.sharded_table.n_shards)
            if B2 != B:
                codes2 = np.concatenate(
                    [codes2, np.zeros((B2 - B, lcap), np.uint8)])
                lengths = np.concatenate(
                    [lengths, np.zeros(B2 - B, np.int32)])
                B = B2

        pcap = lcap - cfg.seed_size + 1
        mq_cap = mq_cap_for(pcap, cfg.num_seeds, cfg.max_stride,
                            cfg.do_overlap)
        ceil_cap = mq_cap * self.max_occ
        a_cap = min(self.a_cap, ceil_cap)
        if self.mesh is None:
            # exact flat-hit sizing pre-pass (dsoft_count is scan + two
            # gathers — no hit buffers) so hit_cap never overflow-retries:
            # each retry recompiled the fused program, which is where the
            # old loop's time actually went at multi-Gbp table scale.
            # hit_cap only grows (sticky) so equal-shape batches reuse the
            # compiled program.
            from darwin_tpu.ops.packed import pack2
            codes_dev = jnp.asarray(pack2(codes2))
            lengths_dev = jnp.asarray(lengths)
            tbl = dict(lut=self.table.prefix_lut,
                       lut_shift=self.table.lut_shift,
                       lut_steps=self.table.lut_steps,
                       bucket_offsets=self.table.bucket_offsets)
            need = dsoft_count(
                codes_dev, lengths_dev, self.table.sorted_hashes,
                k=cfg.seed_size, w=cfg.minimizer_window,
                num_seeds=cfg.num_seeds, max_stride=cfg.max_stride,
                overlap=cfg.do_overlap, max_occ=self.max_occ,
                mq_cap=mq_cap, packed_q=True, **tbl)
            need_h = max(int(np.asarray(need).max()), 1)
            hit_cap = min(max(_round_up_pow2(need_h), self.hit_cap),
                          ceil_cap)
            self.hit_cap = hit_cap
            while True:
                res_dev = dsoft_device(
                    codes_dev, lengths_dev,
                    self.table.sorted_hashes, self.table.positions,
                    k=cfg.seed_size, w=cfg.minimizer_window,
                    num_seeds=cfg.num_seeds, max_stride=cfg.max_stride,
                    overlap=cfg.do_overlap, threshold=cfg.dsoft_threshold,
                    bin_size=cfg.bin_size, max_occ=self.max_occ,
                    mq_cap=mq_cap, a_cap=a_cap, hit_cap=hit_cap,
                    packed_q=True, **tbl)
                counts = np.asarray(jnp.stack(
                    [res_dev["n_hits"], res_dev["n_anchors"],
                     res_dev["n_anchors_raw"],
                     res_dev["n_queried_buckets"], res_dev["n_flat_raw"],
                     res_dev["n_capped"]]))
                need_a = int(counts[2].max())
                if need_a <= a_cap or a_cap >= ceil_cap:
                    break
                a_cap = min(_round_up_pow2(need_a, a_cap * 2), ceil_cap)
                self.a_cap = a_cap
        else:
            # sharded path: hit_cap is per-shard; keep the overflow retry
            hit_cap = min(self.hit_cap, ceil_cap)
            while True:
                from darwin_tpu.parallel.shard_index import dsoft_sharded
                res_dev = dsoft_sharded(
                    self.mesh, jnp.asarray(codes2), jnp.asarray(lengths),
                    self.sharded_table,
                    k=cfg.seed_size, w=cfg.minimizer_window,
                    num_seeds=cfg.num_seeds, max_stride=cfg.max_stride,
                    overlap=cfg.do_overlap, threshold=cfg.dsoft_threshold,
                    bin_size=cfg.bin_size, max_occ=self.max_occ,
                    mq_cap=mq_cap, a_cap=a_cap, hit_cap=hit_cap)
                # worst-case-padded anchor buffers use a tiny real prefix —
                # fetch the counts first, then only the used columns
                counts = np.asarray(jnp.stack(
                    [res_dev["n_hits"], res_dev["n_anchors"],
                     res_dev["n_anchors_raw"],
                     res_dev["n_queried_buckets"], res_dev["n_flat_raw"],
                     res_dev["n_capped"]]))
                need_h = int(counts[4].max())
                need_a = int(counts[2].max())
                ok_h = need_h <= hit_cap or hit_cap >= ceil_cap
                ok_a = need_a <= a_cap or a_cap >= ceil_cap
                if ok_h and ok_a:
                    break
                if not ok_h:
                    hit_cap = min(_round_up_pow2(need_h, hit_cap * 2),
                                  ceil_cap)
                    self.hit_cap = hit_cap    # remember for later batches
                if not ok_a:
                    a_cap = min(_round_up_pow2(need_a, a_cap * 2), ceil_cap)
                    self.a_cap = a_cap
        t0 = mark("seed_dispatch", t0)
        res = {"n_hits": counts[0], "n_anchors": counts[1],
               "n_anchors_raw": counts[2], "n_queried_buckets": counts[3]}
        mh = _round_up_pow2(max(int(counts[0].max()), 1), 512)
        mh = min(mh, res_dev["hits_bin"].shape[1])
        ma = _round_up_pow2(max(int(counts[1].max()), 1), 256)
        ma = min(ma, res_dev["anc_bin"].shape[1])
        import jax

        def as_i32(x):
            # positions are uint32 (full address width); move the bit
            # pattern through the int32 stacked fetch, widen on the host
            return (jax.lax.bitcast_convert_type(x, jnp.int32)
                    if x.dtype == jnp.uint32 else x)

        ph = np.asarray(jnp.stack([as_i32(res_dev["hits_bin"][:, :mh]),
                                   res_dev["hits_off"][:, :mh],
                                   as_i32(res_dev["hits_pos"][:, :mh])]))
        pa = np.asarray(jnp.stack([as_i32(res_dev["anc_pos"][:, :ma]),
                                   res_dev["anc_off"][:, :ma],
                                   as_i32(res_dev["anc_bin"][:, :ma])]))
        res["hits_bin"] = ph[0].view(np.uint32).astype(np.int64)
        res["hits_off"] = ph[1]
        res["hits_pos"] = ph[2].view(np.uint32).astype(np.int64)
        res["anc_pos"] = pa[0].view(np.uint32).astype(np.int64)
        res["anc_off"] = pa[1]
        res["anc_bin"] = pa[2].view(np.uint32).astype(np.int64)

        # unreachable after the retry loop (a_cap grows to the lossless
        # ceiling mq_cap*max_occ, which n_anchors_raw cannot exceed)
        assert not (res["n_anchors_raw"] > a_cap).any(), "anchor overflow"
        t0 = mark("seed_fetch", t0)

        fw, rc = [], []
        for i in range(len(reads)):
            per_strand = []
            for row in (2 * i, 2 * i + 1):
                per_strand.append(chain.chain_anchors(
                    res["hits_bin"][row], res["hits_off"][row],
                    res["hits_pos"][row], int(res["n_hits"][row]),
                    res["anc_pos"][row], res["anc_off"][row],
                    res["anc_bin"][row], int(res["n_anchors"][row]),
                    cfg.bin_size, cfg.do_overlap))
            fw.append(per_strand[0])
            rc.append(per_strand[1])
        mark("seed_chain", t0)
        return SeedResult(fw, rc, int(res["n_queried_buckets"].sum()),
                          int(counts[5].sum()))
