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

from darwin_tpu.ops import gact


@functools.cache
def use_pallas() -> bool:
    """Kernel backend selection: the Pallas kernel (gact_pallas) on real
    TPUs, the lax.scan reference implementation elsewhere (CPU tests,
    virtual meshes).  Override with DARWIN_TPU_KERNEL=pallas|lax."""
    forced = os.environ.get("DARWIN_TPU_KERNEL", "").lower()
    if forced in ("pallas", "lax"):
        return forced == "pallas"
    return jax.devices()[0].platform == "tpu"


def _align_and_traceback(qtile, rtile, qlens, rlens, start_end, params,
                         max_tb, all_start_end):
    if use_pallas():
        from darwin_tpu.ops import gact_pallas
        return gact_pallas.align_and_traceback(
            qtile, rtile, qlens, rlens, start_end, params, max_tb,
            all_start_end=all_start_end)
    return gact.align_and_traceback(qtile, rtile, qlens, rlens, start_end,
                                    params, max_tb,
                                    all_start_end=all_start_end)


def _batch_align_scores(qtile, rtile, qlens, rlens, start_end, params):
    if use_pallas():
        from darwin_tpu.ops import gact_pallas
        return gact_pallas.batch_align(qtile, rtile, qlens, rlens,
                                       start_end, params, with_trace=False)
    return gact.batch_align(qtile, rtile, qlens, rlens, start_end, params,
                            with_trace=False)


@functools.partial(jax.jit, static_argnames=("qt", "rt"))
def gather_tiles(ref_codes, query_codes, r_start, r_size, q_start, q_size,
                 rev, qt: int, rt: int):
    """Gather (B, rt) ref tiles and (B, qt) query tiles.

    rev=True gathers both tiles reversed (the right-extension orientation,
    align_fields reverse_ref+reverse_query, software/extender.cpp:206)."""
    # int32 index arithmetic: coordinate space is capped at 2^31 for now
    # (the reference uses uint32 addresses; genomes beyond 2 Gbp need the
    # planned sharded-genome path).
    nr = ref_codes.shape[0]
    nq = query_codes.shape[0]
    r_start = r_start.astype(jnp.int32)
    r_size = r_size.astype(jnp.int32)
    q_start = q_start.astype(jnp.int32)
    q_size = q_size.astype(jnp.int32)
    i = jnp.arange(rt, dtype=jnp.int32)[None, :]
    ridx = jnp.where(rev[:, None],
                     r_start[:, None] + r_size[:, None] - 1 - i,
                     r_start[:, None] + i)
    rtile = jnp.take(ref_codes, jnp.clip(ridx, 0, nr - 1))
    j = jnp.arange(qt, dtype=jnp.int32)[None, :]
    qidx = jnp.where(rev[:, None],
                     q_start[:, None] + q_size[:, None] - 1 - j,
                     q_start[:, None] + j)
    qtile = jnp.take(query_codes, jnp.clip(qidx, 0, nq - 1))
    return qtile, rtile


def first_tile_scores(ref_codes, query_codes, r_start, r_size, q_start,
                      q_size, params, qt: int, rt: int):
    """Filter-stage dispatch: max-cell scores + positions, no traceback
    (software/filter.cpp:40,71: do_traceback=0, align_fields max-mode)."""
    B = r_start.shape[0]
    rev = jnp.zeros((B,), bool)
    qtile, rtile = gather_tiles(ref_codes, query_codes, r_start, r_size,
                                q_start, q_size, rev, qt, rt)
    return _batch_align_scores(qtile, rtile, q_size.astype(jnp.int32),
                               r_size.astype(jnp.int32),
                               jnp.zeros((B,), bool), params)


def extend_tiles(ref_codes, query_codes, r_start, r_size, q_start, q_size,
                 rev, params, qt: int, rt: int, max_tb: int):
    """Extension-stage dispatch: start_end DP + traceback in one program."""
    B = r_start.shape[0]
    qtile, rtile = gather_tiles(ref_codes, query_codes, r_start, r_size,
                                q_start, q_size, rev, qt, rt)
    return _align_and_traceback(
        qtile, rtile, q_size.astype(jnp.int32), r_size.astype(jnp.int32),
        jnp.ones((B,), bool), params, max_tb, all_start_end=True)
