"""Device dispatchers: tile gather from resident sequence buffers + DP.

The reference passes DRAM addresses per tile and lets the kernel index host
memory with on-the-fly reverse/complement (software/Processor.cpp:105,276).
TPU-natively, the genome and the read batch live in HBM as uint8 code
arrays; tiles are gathered on device by index arithmetic (reversal = a
reversed iota) and fed straight into the batched DP — one dispatch per step,
nothing but compact results returning to the host.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from darwin_tpu.ops import gact
from darwin_tpu.ops.oracle import OP_M as _OPM, OP_I as _OPI, OP_D as _OPD

orc_OP_M = int(_OPM)
orc_OP_I = int(_OPI)
orc_OP_D = int(_OPD)


@functools.cache
def use_pallas() -> bool:
    """Kernel backend selection: the Pallas kernel (gact_pallas) on real
    TPUs, the lax.scan reference implementation elsewhere (CPU tests,
    virtual meshes).  Override with DARWIN_TPU_KERNEL=pallas|lax."""
    forced = os.environ.get("DARWIN_TPU_KERNEL", "").lower()
    if forced in ("pallas", "lax"):
        return forced == "pallas"
    return jax.devices()[0].platform == "tpu"


# process-wide telemetry for the lossless recovery paths (sweep spill /
# compact-record overflow reruns).  Printed as a delta per run() alongside
# the other non-reference counters; GIL-racing += is fine for telemetry.
RECOVERY = {"rerun_dispatches": 0, "rerun_lanes": 0}


def rec_bits() -> int:
    """Traceback-record packing width in the fused dispatch results:
    16 = one int16 record per entry (wide), 8 (default) or 4 = 16//bits
    records per entry (gact_pallas._compact_records).  Narrower packing
    cuts the dominant device->host fetch of the extension loop 2x/4x; a
    lane whose traceback holds an insert run wider than the nI field
    (> 63 at 8 bits, > 3 at 4) is flagged in the result and rerun through
    the wide layout, so the output is unconditionally lossless at any
    width.  DARWIN_TPU_RECBITS selects (DARWIN_TPU_REC8=0 forces 16,
    kept as the A/B alias).  Read per dispatch — the width is a static
    jit argument, not baked into a cache."""
    if os.environ.get("DARWIN_TPU_REC8", "") == "0":
        return 16
    bits = int(os.environ.get("DARWIN_TPU_RECBITS", "8"))
    if bits not in (4, 8, 16):
        raise ValueError(f"DARWIN_TPU_RECBITS must be 4, 8 or 16: {bits}")
    return bits


def _interp() -> bool:
    """Run the fused dispatch programs' Pallas kernels in interpret mode
    (DARWIN_TPU_PALLAS_INTERPRET=1) so the TPU-only dispatch path —
    speculative chains, spill/overflow reruns, result packing — is
    testable on CPU.  Read at trace time: set it before the first
    dispatch in a process (the jit caches bake the value in)."""
    return os.environ.get("DARWIN_TPU_PALLAS_INTERPRET", "") == "1"


def use_pallas_for(params) -> bool:
    """Backend selection for a concrete scoring.  Since the Pallas kernels
    gained the generic-scoring closed form (gact_pallas._dp_kernel's
    `generic` branch) they cover ANY scoring — matching the reference's
    one-kernel-for-all contract (software/Processor.cpp:48-80) — so this
    is now just the platform check.  (gact.prefix_ok still routes the
    *lax* kernel's internal scan choice.)"""
    return use_pallas()


# memoized by params identity + geometry (reading params.sub is a
# blocking device fetch; this runs per dispatch in the hot loop).
# Bounded like gact._PARAMS_CACHE: past the cap both structures reset, so
# long-lived processes cannot grow them without bound.
_PACK_CHECK_CACHE: dict = {}
_PACK_CHECK_KEEP: list = []
_PACK_CHECK_MAX = 256


def check_int16_packing(params, qt: int, rt: int, max_tb: int):
    """The packed device->host result matrix is int16; verify the
    configured geometry/scoring cannot overflow it.  The DP is local
    (H >= 0 throughout), so the score is bounded by the largest positive
    substitution score times the shorter tile side; steps are bounded by
    2*max_tb and run-length records by a 14-bit count.  Exotic configs
    fail loudly here instead of silently corrupting scores (params.cfg is
    user-supplied)."""
    key = (id(params), qt, rt, max_tb)
    if key in _PACK_CHECK_CACHE:
        return
    max_sub = max(max(int(v) for v in row) for row in np.asarray(params.sub))
    bound = max(max_sub, 0) * min(qt, rt)
    if bound >= 1 << 15 or 2 * max_tb >= 1 << 15 or qt + rt >= 1 << 14:
        raise ValueError(
            f"tile geometry ({qt}x{rt}, max_tb={max_tb}) with this scoring "
            f"overflows the int16 packed result (score bound {bound}); "
            "reduce tile_size or the scoring magnitudes")
    if len(_PACK_CHECK_KEEP) >= _PACK_CHECK_MAX:
        _PACK_CHECK_CACHE.clear()
        _PACK_CHECK_KEEP.clear()
    _PACK_CHECK_CACHE[key] = True
    _PACK_CHECK_KEEP.append(params)


def _align_and_traceback(qtile, rtile, qlens, rlens, start_end, params,
                         max_tb, all_start_end):
    if use_pallas_for(params):
        from darwin_tpu.ops import gact_pallas
        return gact_pallas.align_and_traceback(
            qtile, rtile, qlens, rlens, start_end, params, max_tb,
            all_start_end=all_start_end)
    return gact.align_and_traceback(qtile, rtile, qlens, rlens, start_end,
                                    params, max_tb,
                                    all_start_end=all_start_end)


def _batch_align_scores(qtile, rtile, qlens, rlens, start_end, params):
    if use_pallas_for(params):
        from darwin_tpu.ops import gact_pallas
        return gact_pallas.batch_align(qtile, rtile, qlens, rlens,
                                       start_end, params, with_trace=False)
    return gact.batch_align(qtile, rtile, qlens, rlens, start_end, params,
                            with_trace=False)


# Chunk size for >2 GiB genome buffers: a single XLA array past 2^31
# elements miscomputes on this backend, so big genomes upload as a 2-D
# (n_chunks, CHUNK_ELEMS) array and gathers split the uint32 address into
# (chunk, local).  Matches the reference's uint32 / 4 GiB DRAM address
# space (software/DRAM.cpp:8-13, Darwin.bond:99-101).
CHUNK_BITS = 30
CHUNK_ELEMS = 1 << CHUNK_BITS


def chunk_ref_codes(codes: np.ndarray):
    """Host->device layout for a genome code buffer: 1-D for < 2^31
    elements (fast int32 path), else chunk-padded (n_chunks, CHUNK_ELEMS)
    for the uint32 two-level gather."""
    if codes.shape[0] < (1 << 31):
        return codes
    n = -(-codes.shape[0] // CHUNK_ELEMS)
    pad = n * CHUNK_ELEMS - codes.shape[0]
    if pad:
        codes = np.concatenate([codes, np.full(pad, 4, np.uint8)])
    return codes.reshape(n, CHUNK_ELEMS)


def _gather_seq(codes, idx_u32):
    """Gather codes[idx] where codes is 1-D (int32 indices, clipped),
    chunked 2-D (uint32 two-level), or the packed-genome pair
    (packed_bytes, n_bounds) — 2-bit byte gather + bit extract +
    N-parity overwrite, no materialized byte buffer (ops/packed.py).
    Out-of-range indices (padding lanes, including uint32-wrapped ones)
    return in-bounds garbage / N — every such lane is masked by the DP's
    length masking."""
    if isinstance(codes, (tuple, list)):
        from darwin_tpu.ops.packed import gather_codes5
        return gather_codes5(codes[0], codes[1], idx_u32)
    if codes.ndim == 1:
        n = codes.shape[0]
        return jnp.take(codes, jnp.clip(idx_u32.astype(jnp.int32),
                                        0, n - 1))
    nch = codes.shape[0]
    ch = jnp.minimum(idx_u32 >> CHUNK_BITS, np.uint32(nch - 1))
    lo = idx_u32 & np.uint32(CHUNK_ELEMS - 1)
    return codes.at[ch.astype(jnp.int32), lo.astype(jnp.int32)].get(
        mode="promise_in_bounds")


@functools.partial(jax.jit, static_argnames=("qt", "rt"))
def gather_tiles(ref_codes, query_codes, r_start, r_size, q_start, q_size,
                 rev, qt: int, rt: int):
    """Gather (B, rt) ref tiles and (B, qt) query tiles.

    rev=True gathers both tiles reversed (the right-extension orientation,
    align_fields reverse_ref+reverse_query, software/extender.cpp:206).
    Index arithmetic runs in uint32 — the reference's own address width
    (4 GiB DRAM) — with underflows landing in masked padding lanes."""
    r_start = r_start.astype(jnp.uint32)
    r_size = r_size.astype(jnp.uint32)
    q_start = q_start.astype(jnp.uint32)
    q_size = q_size.astype(jnp.uint32)
    i = jnp.arange(rt, dtype=jnp.uint32)[None, :]
    ridx = jnp.where(rev[:, None],
                     r_start[:, None] + r_size[:, None] - 1 - i,
                     r_start[:, None] + i)
    rtile = _gather_seq(ref_codes, ridx)
    j = jnp.arange(qt, dtype=jnp.uint32)[None, :]
    qidx = jnp.where(rev[:, None],
                     q_start[:, None] + q_size[:, None] - 1 - j,
                     q_start[:, None] + j)
    qtile = _gather_seq(query_codes, qidx)
    return qtile, rtile


def pad_batch(b: int) -> int:
    """Host-side batch padding for one dispatch.  On the Pallas path the
    kernel computes full 128-lane blocks regardless, so intermediate
    power-of-two sizes would only multiply compiled variants (each (B, qt,
    rt) is its own program) without saving any device work; pad straight
    to lane-block multiples.  The lax path keeps small powers of two."""
    if use_pallas():
        return max(128, -(-b // 128) * 128)
    return max(8, 1 << (b - 1).bit_length())


def _pack_requests(r_start, r_size, q_start, q_size, rev=None):
    """Stack the per-tile request vectors into ONE (5, B) uint32
    host->device transfer (the reference's BatchAlignmentInputFieldsDRAM
    batching, software/Darwin.bond:131-135 — one message per batch, not
    one per field).  uint32 is the full reference address width (4 GiB
    DRAM); individual device_puts dominate round latency otherwise."""
    rows = [np.asarray(r_start, np.uint64), np.asarray(r_size, np.uint64),
            np.asarray(q_start, np.uint64), np.asarray(q_size, np.uint64),
            np.zeros(len(np.asarray(r_start)), np.uint64) if rev is None
            else np.asarray(rev).astype(np.uint64)]
    return jnp.asarray(np.stack(rows).astype(np.uint32))


@functools.partial(jax.jit, static_argnames=("qt", "rt", "max_tb",
                                             "params_static", "safe",
                                             "bits"))
def _extend_round_pallas(ref_codes, query_codes, req, params_static,
                         qt, rt, max_tb, safe=False, bits=16):
    """One fused device program per extension round: tile gather + Pallas
    DP + sweep traceback + result packing.  Returns (R + 6, Bpad) int16:
    rows [0, R) the traceback records — one per row at bits=16, 16//bits
    per entry otherwise (gact_pallas._compact_records) — then q_steps,
    r_steps, score, qpos, rpos, and a flag row (sweep spill |
    compact-record overflow; flagged lanes rerun wide+safe)."""
    from darwin_tpu.ops import gact_pallas
    r_start, r_size = req[0], req[1].astype(jnp.int32)
    q_start, q_size = req[2], req[3].astype(jnp.int32)
    rev = req[4] != 0
    qtile, rtile = gather_tiles(ref_codes, query_codes, r_start, r_size,
                                q_start, q_size, rev, qt, rt)
    se = jnp.ones(r_start.shape, bool)
    res = gact_pallas._dp_call(qtile, rtile, q_size, r_size, se,
                               params_static, True, True, _interp())
    rec, qsteps, rsteps, spill = gact_pallas._tb_call(
        res["trace"], q_size - 1, r_size - 1, max_tb, _interp(), safe=safe)
    Bp = rec.shape[1]
    if bits != 16:
        rec, ovf = gact_pallas._compact_records(rec, bits)
        spill = spill | ovf

    def row(x):
        return jnp.pad(x.astype(jnp.int32), (0, Bp - x.shape[0]))[None, :]

    # int16 halves the per-round device->host transfer; every row fits
    # (records are 14+2 bits — or an 8-bit pair when compact — steps
    # <= 2*max_tb <= 2*1984, |score| and positions < 2*tile for any
    # supported tile geometry)
    return jnp.concatenate(
        [rec, qsteps[None, :], rsteps[None, :], row(res["score"]),
         row(res["query_max_pos"]), row(res["ref_max_pos"]),
         spill[None, :]],
        axis=0).astype(jnp.int16)


def _device_consumed(rec, r_size, q_size, stop_thr, max_ops):
    """Per-lane (dr, dq) advance a tile's traceback produces under the
    extender's early-cutoff rule (extender.cpp:327-329, see
    pipeline/extend.py::_Ext._applied_ops): ops are taken per 32-op word;
    once the running step count reaches stop_thr, each word is consumed
    only up to (and including) its first M.

    rec: (RT, B) int32 traceback records (14-bit nI + 2-bit closing) in
    column order.  The walk visits columns start_r=r_size-1 down to 0;
    rows above start_r are all-zero.  Used ONLY for speculation — the host
    validates the resulting tile request, so this must be fast, not
    load-bearing.
    """
    RT, B = rec.shape
    nI = rec & 0x3FFF
    closing = (rec >> 14) & 0x3
    nI = nI[::-1]                      # walk order (descending column)
    closing = closing[::-1]
    has_close = (closing != 0).astype(jnp.int32)
    cnt = nI + has_close
    ends = jnp.cumsum(cnt, axis=0)     # inclusive
    starts = ends - cnt
    n_ops = ends[-1]                   # (B,)

    L = -(-max_ops // 32) * 32
    lane = jax.lax.broadcasted_iota(jnp.int32, (RT, B), 1)
    close_pos = jnp.where(has_close == 1, starts + nI, L)  # L = dropped
    ops = jnp.full((L, B), orc_OP_I, jnp.int32)
    ops = ops.at[close_pos, lane].set(closing, mode="drop")
    opidx = jax.lax.broadcasted_iota(jnp.int32, (L, B), 0)
    ops = jnp.where(opidx < n_ops[None, :], ops, 0)

    blocks = ops.reshape(L // 32, 32, B)
    bidx = jnp.arange(1, 33, dtype=jnp.int32)[None, :, None]  # 1-based
    t32 = jnp.arange(0, L, 32, dtype=jnp.int32)

    def blk_step(carry, xs):
        blk, t0 = xs
        count, dr, dq = carry
        # `count` is the APPLIED step count (truncated blocks shrink it,
        # extender.cpp:331 count semantics); the block's valid length is
        # governed by its ORIGINAL offset t0 in the op stream
        steps = count[None, None, :] + bidx               # (1, 32, B)
        cond = (steps >= stop_thr) & (blk[None] == orc_OP_M)
        first = jnp.min(jnp.where(cond[0], bidx[0], 33), axis=0)  # (B,)
        trunc = jnp.where(first <= 32, first, 32)
        valid_len = jnp.clip(n_ops - t0, 0, 32)
        consumed = jnp.minimum(trunc, valid_len)
        take = bidx[0] <= consumed[None, :]
        dr = dr + jnp.sum(jnp.where(take & (blk != orc_OP_I), 1, 0), axis=0)
        dq = dq + jnp.sum(jnp.where(take & (blk != orc_OP_D), 1, 0), axis=0)
        return (count + consumed, dr, dq), None

    zeros = jnp.zeros((B,), jnp.int32)
    (cnt_fin, dr, dq), _ = jax.lax.scan(blk_step, (zeros, zeros, zeros),
                                        (blocks, t32))
    return dr, dq


# Speculative chain depth: rounds are host-round-trip-bound while the
# chained tile DP is cheap, so deeper chains win until result-fetch
# bytes catch up (measured optimum ~12 for 10 kb reads; outputs are
# K-invariant by construction - levels are accepted only while the
# device-computed request matches the exact host decode).
SPEC_K = int(os.environ.get("DARWIN_TPU_SPEC_K", "12"))


def _subset_requests(req, idx) -> jnp.ndarray:
    """Columns ``idx`` of a packed request matrix, padded to a 128-lane
    multiple with benign rows (sizes 1, everything else 0) — the spilled
    lanes of a round gathered into their own small rerun batch."""
    r = np.asarray(req)
    nrows = r.shape[0]
    bs = max(128, -(-len(idx) // 128) * 128)
    out = np.zeros((nrows, bs), r.dtype)
    for row in (1, 3, 6, 8):          # r_size, q_size, chrom_len, q_len
        if row < nrows:
            out[row] = 1
    out[:, :len(idx)] = r[:, idx]
    return jnp.asarray(out)


def _pack_spec_requests(r_start, r_size, q_start, q_size, rev, chrom_start,
                        chrom_len, q_buf_start, q_len):
    """Row layout consumed by _extend_round_spec_pallas (rows 0..8);
    shared by the single-device and mesh speculative dispatchers.
    Returns (req_u32, r_start_i64, q_start_i64)."""
    rows = [np.asarray(r_start, np.uint64), np.asarray(r_size, np.uint64),
            np.asarray(q_start, np.uint64), np.asarray(q_size, np.uint64),
            np.asarray(rev).astype(np.uint64),
            np.asarray(chrom_start, np.uint64),
            np.asarray(chrom_len, np.uint64),
            np.asarray(q_buf_start, np.uint64),
            np.asarray(q_len, np.uint64)]
    return (np.stack(rows).astype(np.uint32),
            rows[0].astype(np.int64), rows[2].astype(np.int64))


@functools.partial(jax.jit, static_argnames=("qt", "rt", "max_tb",
                                             "params_static", "stop_thr",
                                             "K", "safe", "bits"))
def _extend_round_spec_pallas(ref_codes, query_codes, req, params_static,
                              qt, rt, max_tb, stop_thr, K, safe=False,
                              bits=16):
    """K chained extension tiles per dispatch.  Tile 1 is exact; each
    subsequent tile's request is predicted from the previous tile's
    cutoff advance (dr, dq) and computed speculatively in the same
    program.  The packed int16 result carries all K record matrices,
    tile 1's stats, and each speculative request as deltas vs its
    predecessor's — the host walks the chain, accepting tile j+1 only
    while the reconstructed request equals the true one after tile j's
    exact decode.

    Rows: [rec_1..rec_K (K*R) | q_steps1 r_steps1 score1 qpos1 rpos1 |
           (d_rstart d_rsize d_qstart d_qsize) * (K-1) | flag]
    with R = RTp at bits=16 (one int16 record per row) and
    ceil(RTp/(16//bits)) otherwise (packed records); flag = sweep spill |
    compact-record overflow, either of which sends the lane through the
    wide+safe rerun.
    """
    from darwin_tpu.ops import gact_pallas
    r_start, r_size = req[0], req[1].astype(jnp.int32)
    q_start, q_size = req[2], req[3].astype(jnp.int32)
    rev = req[4] != 0
    chrom_start = req[5]                   # uint32 (full address width)
    q_buf_start = req[7]
    q_len = req[8].astype(jnp.int32)
    se = jnp.ones(r_start.shape, bool)
    B0 = r_start.shape[0]
    TT = jnp.int32(qt)                     # speculation is (qt, rt) = (T, T)
    cl32 = req[6].astype(jnp.int32)        # per-chromosome length < 2^31

    def one_tile(rs, rsz, qs, qsz):
        qtile, rtile = gather_tiles(ref_codes, query_codes, rs, rsz,
                                    qs, qsz, rev, qt, rt)
        res = gact_pallas._dp_call(qtile, rtile, qsz, rsz, se,
                                   params_static, True, True, _interp())
        rec, qsteps, rsteps, spill = gact_pallas._tb_call(
            res["trace"], qsz - 1, rsz - 1, max_tb, _interp(), safe=safe)
        return res, rec, qsteps, rsteps, spill

    res1, rec1, qsteps1, rsteps1, spill = one_tile(r_start, r_size,
                                                   q_start, q_size)
    Bp = rec1.shape[1]

    def row(x):
        return jnp.pad(x.astype(jnp.int32), (0, Bp - x.shape[0]))[None, :]

    recs = [rec1]
    delta_rows = []
    # chromosome-relative int32 coordinates (each chromosome < 2^31; the
    # uint32 subtraction is exact for in-chromosome addresses)
    rel_r = (r_start.astype(jnp.uint32)
             - chrom_start.astype(jnp.uint32)).astype(jnp.int32)
    rel_q = (q_start.astype(jnp.uint32)
             - q_buf_start.astype(jnp.uint32)).astype(jnp.int32)
    curr_ref = jnp.where(rev, rel_r, rel_r + r_size - 1)
    curr_q = jnp.where(rev, rel_q, rel_q + q_size - 1)
    prev = (r_start, r_size, q_start, q_size, rec1)
    for _lvl in range(K - 1):
        p_rs, p_rsz, p_qs, p_qsz, p_rec = prev
        dr, dq = _device_consumed(p_rec[:, :B0].astype(jnp.int32), p_rsz,
                                  p_qsz, stop_thr, qt + rt)
        # next-tile geometry (mirrors _Ext.request / decode clamps):
        # left: window ending at curr; right: window starting at curr
        curr_ref = jnp.where(rev, jnp.minimum(curr_ref + dr, cl32),
                             jnp.maximum(curr_ref - dr, 0))
        curr_q = jnp.where(rev, jnp.minimum(curr_q + dq, q_len),
                           jnp.maximum(curr_q - dq, 0))
        rsz2 = jnp.maximum(jnp.where(rev, jnp.minimum(cl32 - curr_ref, TT),
                                     jnp.minimum(curr_ref + 1, TT)), 1)
        qsz2 = jnp.maximum(jnp.where(rev, jnp.minimum(q_len - curr_q, TT),
                                     jnp.minimum(curr_q + 1, TT)), 1)
        r_rel2 = jnp.where(rev, curr_ref,
                           jnp.where(curr_ref >= TT, curr_ref - TT + 1, 0))
        q_rel2 = jnp.where(rev, curr_q,
                           jnp.where(curr_q >= TT, curr_q - TT + 1, 0))
        rs2 = chrom_start.astype(jnp.uint32) + r_rel2.astype(jnp.uint32)
        qs2 = q_buf_start.astype(jnp.uint32) + q_rel2.astype(jnp.uint32)
        _, rec2, _, _, spill2 = one_tile(rs2, rsz2, qs2, qsz2)
        spill = spill | spill2
        recs.append(rec2)
        # level-to-level address deltas are < +-2 tiles: exact in int32
        # (uint32 wraparound difference) and in the int16 packed rows
        delta_rows += [
            row((rs2 - p_rs.astype(jnp.uint32)).astype(jnp.int32)),
            row(rsz2),
            row((qs2 - p_qs.astype(jnp.uint32)).astype(jnp.int32)),
            row(qsz2)]
        prev = (rs2, rsz2, qs2, qsz2, rec2)

    flag = spill
    if bits != 16:
        compacted = []
        for r in recs:
            cr, ovf = gact_pallas._compact_records(r, bits)
            compacted.append(cr)
            flag = flag | ovf
        recs = compacted
    return jnp.concatenate(
        recs + [qsteps1[None, :], rsteps1[None, :], row(res1["score"]),
                row(res1["query_max_pos"]), row(res1["ref_max_pos"])]
        + delta_rows + [flag[None, :]], axis=0).astype(jnp.int16)


def extend_tiles_spec_async(ref_codes, query_codes, r_start, r_size,
                            q_start, q_size, rev, chrom_start, chrom_len,
                            q_buf_start, q_len, params, qt: int, rt: int,
                            max_tb: int, stop_thr: int):
    """Speculative K-tile extension dispatch (standard square tiles
    only).  resolve() returns the usual tile-1 dict plus, for each
    speculative level j in 1..K-1:
      ops_spec/n_ops_spec : lists of tile j's expanded traceback
      spec_req            : list of (r_start, r_size, q_start, q_size)
                            int64 tuples — the request each speculative
                            tile was actually computed under
    """
    B = int(np.asarray(r_start).shape[0])
    K = SPEC_K
    check_int16_packing(params, qt, rt, max_tb)
    from darwin_tpu.ops import gact_pallas
    bits = rec_bits()
    req, r_start64, q_start64 = _pack_spec_requests(
        r_start, r_size, q_start, q_size, rev, chrom_start, chrom_len,
        q_buf_start, q_len)
    packed_dev = _extend_round_spec_pallas(
        ref_codes, query_codes, req, gact_pallas._static_params(params),
        qt, rt, max_tb, stop_thr, K, bits=bits)

    def rerun_wide(idx):
        # per-lane recovery: only the flagged lanes (sweep spill or
        # compact-record overflow) rerun — safe sweep, wide records;
        # returns (packed, source column per idx entry)
        RECOVERY["rerun_dispatches"] += 1
        RECOVERY["rerun_lanes"] += len(idx)
        sub = _extend_round_spec_pallas(
            ref_codes, query_codes, _subset_requests(req, idx),
            gact_pallas._static_params(params), qt, rt, max_tb,
            stop_thr, K, safe=True, bits=16)
        return sub, np.arange(len(idx))

    return _make_spec_resolver(packed_dev, rerun_wide, B, K, qt, max_tb,
                               r_start64, q_start64, bits)


def _make_spec_resolver(packed_dev, rerun_wide, B, K, qt, max_tb,
                        r_start64, q_start64, bits):
    """Shared resolve() for the speculative packed result (single-device
    and mesh paths).  ``rerun_wide(idx)`` -> (packed_subset, cols): the
    safe-sweep wide-record results for flagged lanes ``idx``, found at
    columns ``cols`` of the returned matrix.  ``bits`` describes the
    primary matrix's record layout (the rerun is always wide)."""
    from darwin_tpu.ops import gact_pallas

    def resolve():
        packed = np.asarray(packed_dev)
        nrows = packed.shape[0]
        tailr = 6 + 4 * (K - 1)
        R = (nrows - tailr) // K
        # compact rows may carry padded zero records (they expand to no
        # ops), so R*(16//bits) bounds the wide record count from above
        L = min(qt + R * (16 // bits), 2 * max_tb)
        expand = (gact_pallas._expand_records if bits == 16
                  else functools.partial(
                      gact_pallas._expand_records_packed, bits=bits))
        flagged = np.flatnonzero(packed[-1][:B] != 0)
        sub = cols = Rw = None
        tail = packed[K * R:]
        if flagged.size:  # sweep spill / record overflow: lossless rerun
            # (RECOVERY telemetry is counted inside rerun_wide; both the
            # single-device and mesh variants rerun only `flagged`)
            sub_dev, cols = rerun_wide(flagged)
            sub = np.asarray(sub_dev)
            Rw = (sub.shape[0] - tailr) // K
            tail = np.array(tail)
            tail[:, flagged] = sub[K * Rw:][:, cols]

        def level(j):
            o, n = expand(packed[j * R:(j + 1) * R], B, L)
            if sub is not None:
                nv = int(cols.max()) + 1
                ow, nw = gact_pallas._expand_records(
                    sub[j * Rw:(j + 1) * Rw], nv, L)
                o[flagged], n[flagged] = ow[cols], nw[cols]
            return o, n

        ops1, n1 = level(0)
        u = lambda r: r.astype(np.int64) & 0xFFFF  # unsigned row view
        ops_spec, n_spec, spec_req = [], [], []
        prev_rs, prev_qs = r_start64, q_start64
        for j in range(1, K):
            o, n = level(j)
            ops_spec.append(o)
            n_spec.append(n)
            d = tail[5 + 4 * (j - 1):5 + 4 * j]
            rs = prev_rs + d[0][:B].astype(np.int64)
            qs = prev_qs + d[2][:B].astype(np.int64)
            spec_req.append((rs, u(d[1])[:B], qs, u(d[3])[:B]))
            prev_rs, prev_qs = rs, qs
        return {"ops": ops1, "n_ops": n1,
                "q_steps": tail[0][:B], "r_steps": tail[1][:B],
                "score": tail[2][:B], "query_max_pos": tail[3][:B],
                "ref_max_pos": tail[4][:B],
                "ops_spec": ops_spec, "n_ops_spec": n_spec,
                "spec_req": spec_req}
    return resolve


@functools.partial(jax.jit, static_argnames=("qt", "rt", "params_static"))
def _first_tiles_pallas(ref_codes, query_codes, req, params_static, qt, rt):
    """One fused device program for the filter stage: gather + max-cell DP,
    results packed as (3, B) int32 (score, query_max_pos, ref_max_pos)."""
    from darwin_tpu.ops import gact_pallas
    r_start, r_size = req[0], req[1].astype(jnp.int32)
    q_start, q_size = req[2], req[3].astype(jnp.int32)
    rev = req[4] != 0
    qtile, rtile = gather_tiles(ref_codes, query_codes, r_start, r_size,
                                q_start, q_size, rev, qt, rt)
    res = gact_pallas._dp_call(qtile, rtile, q_size, r_size,
                               jnp.zeros(r_start.shape, bool),
                               params_static, False, False, _interp())
    return jnp.stack([res["score"], res["query_max_pos"],
                      res["ref_max_pos"]]).astype(jnp.int32)


def first_tile_scores(ref_codes, query_codes, r_start, r_size, q_start,
                      q_size, params, qt: int, rt: int):
    """Filter-stage dispatch: max-cell scores + positions, no traceback
    (software/filter.cpp:40,71: do_traceback=0, align_fields max-mode)."""
    if use_pallas_for(params):
        from darwin_tpu.ops import gact_pallas
        req = _pack_requests(r_start, r_size, q_start, q_size)
        packed = _first_tiles_pallas(
            ref_codes, query_codes, req,
            gact_pallas._static_params(params), qt, rt)
        # device arrays — the caller's np.asarray is the (deferred) fetch,
        # so both strands' dispatches overlap; "packed" lets the caller
        # pull all three rows in ONE device->host transfer
        return {"score": packed[0], "query_max_pos": packed[1],
                "ref_max_pos": packed[2], "packed": packed}
    B = r_start.shape[0]
    rev = jnp.zeros((B,), bool)
    qtile, rtile = gather_tiles(ref_codes, query_codes,
                                jnp.asarray(np.asarray(r_start, np.uint64)
                                            .astype(np.uint32)),
                                jnp.asarray(np.asarray(r_size, np.int32)),
                                jnp.asarray(np.asarray(q_start, np.uint64)
                                            .astype(np.uint32)),
                                jnp.asarray(np.asarray(q_size, np.int32)),
                                rev, qt, rt)
    return _batch_align_scores(qtile, rtile,
                               jnp.asarray(np.asarray(q_size, np.int32)),
                               jnp.asarray(np.asarray(r_size, np.int32)),
                               jnp.zeros((B,), bool), params)


def extend_tiles_async(ref_codes, query_codes, r_start, r_size, q_start,
                       q_size, rev, params, qt: int, rt: int, max_tb: int):
    """Extension-stage dispatch, split into enqueue + resolve.

    Returns a zero-arg ``resolve()`` producing the result dict.  The device
    program is enqueued immediately; the (blocking) device->host fetch only
    happens inside resolve, so a caller with several tile-shape groups per
    round can enqueue them all and overlap each group's fetch/decode with
    the others' compute (the TPU analog of the reference keeping
    batch_size slots in flight, software/extender.cpp:45-533).

    On the Pallas path one host->device transfer carries the whole request
    batch and one device->host transfer returns the packed traceback
    records + stats; everything in between is a single compiled program.
    """
    B = int(np.asarray(r_start).shape[0])
    if use_pallas_for(params):
        from darwin_tpu.ops import gact_pallas
        check_int16_packing(params, qt, rt, max_tb)
        bits = rec_bits()
        req = _pack_requests(r_start, r_size, q_start, q_size, rev)
        packed_dev = _extend_round_pallas(
            ref_codes, query_codes, req,
            gact_pallas._static_params(params), qt, rt, max_tb, bits=bits)

        def resolve():
            packed = np.asarray(packed_dev)
            R = packed.shape[0] - 6
            L = min(qt + R * (16 // bits), 2 * max_tb)
            expand = (gact_pallas._expand_records if bits == 16
                      else functools.partial(
                          gact_pallas._expand_records_packed, bits=bits))
            ops, n_ops = expand(packed[:R], B, L)
            tail = packed[R:]
            flagged = np.flatnonzero(packed[-1][:B] != 0)
            if flagged.size:
                # fast-sweep spill or compact-record overflow: those
                # lanes rerun safe + wide (lossless either way)
                RECOVERY["rerun_dispatches"] += 1
                RECOVERY["rerun_lanes"] += int(flagged.size)
                sub = np.asarray(_extend_round_pallas(
                    ref_codes, query_codes, _subset_requests(req, flagged),
                    gact_pallas._static_params(params), qt, rt, max_tb,
                    safe=True, bits=16))
                Rw = sub.shape[0] - 6
                ow, nw = gact_pallas._expand_records(
                    sub[:Rw], flagged.size, L)
                ops[flagged], n_ops[flagged] = ow, nw
                tail = np.array(tail)
                tail[:, flagged] = sub[Rw:][:, :flagged.size]
            return {"ops": ops, "n_ops": n_ops,
                    "q_steps": tail[0][:B], "r_steps": tail[1][:B],
                    "score": tail[2][:B], "query_max_pos": tail[3][:B],
                    "ref_max_pos": tail[4][:B]}
        return resolve
    qtile, rtile = gather_tiles(ref_codes, query_codes,
                                jnp.asarray(np.asarray(r_start, np.uint64)
                                            .astype(np.uint32)),
                                jnp.asarray(np.asarray(r_size, np.int32)),
                                jnp.asarray(np.asarray(q_start, np.uint64)
                                            .astype(np.uint32)),
                                jnp.asarray(np.asarray(q_size, np.int32)),
                                jnp.asarray(np.asarray(rev)), qt, rt)
    res = _align_and_traceback(
        qtile, rtile, jnp.asarray(np.asarray(q_size, np.int32)),
        jnp.asarray(np.asarray(r_size, np.int32)),
        jnp.ones((B,), bool), params, max_tb, all_start_end=True)
    return lambda: res


def extend_tiles(ref_codes, query_codes, r_start, r_size, q_start, q_size,
                 rev, params, qt: int, rt: int, max_tb: int):
    """Synchronous extension-stage dispatch (see extend_tiles_async)."""
    return extend_tiles_async(ref_codes, query_codes, r_start, r_size,
                              q_start, q_size, rev, params, qt=qt, rt=rt,
                              max_tb=max_tb)()
