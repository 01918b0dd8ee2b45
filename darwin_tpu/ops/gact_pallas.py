"""Pallas TPU kernel for the batched GACT tile DP.

Same semantics as ``darwin_tpu.ops.gact.batch_align`` (the lax.scan
reference implementation, itself oracle-checked against
``darwin_tpu.ops.oracle.clean_align`` — the spec distilled from the
reference's DualAlignSIMD, software/Processor.cpp:164-566).  This kernel is
the TPU answer to the reference's two compute engines at once:

* the AVX2 striped SW kernel (software/Processor.cpp:164-566): 16 int16
  lanes, one tile at a time, lazy-F correction loop;
* the RTL systolic array (RTL/GACT/SmithWatermanArray.v): 64 PEs, one tile
  at a time, reference streamed through the PE chain.

Here a *batch block* of 128 tiles rides the 128 VPU lanes and the full
query dimension rides the sublanes, so one grid step computes 128 tiles x
QT cells of one reference column.  The DP state (H/E/E_L rows, pending gap
open bits) lives in VMEM scratch across the column loop — nothing but the
packed 8-bit trace slab leaves the chip per column, and only compact
score/pos vectors at the end.

The within-column coupled gap recurrence (the reference's lazy-F loop,
Processor.cpp:382-497) is solved exactly by two log-depth prefix maxima
over the sublane axis (see gact._column_gaps_prefix for the derivation),
valid whenever opening is not cheaper than extending.

Grid = (B/128, RT) with the column dimension sequential ("arbitrary") so
scratch carries across columns; the batch dimension is parallel (megacore
splits batch blocks across cores).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from darwin_tpu.ops import gact

LANES = 128
NEG16 = -(1 << 28)


def _shift_down(x, s, fill):
    """x[q] <- x[q-s] along axis 0; rows < s get `fill`.

    Lowered by Mosaic to sublane shifts (s < 8) / vreg renumbering
    (s % 8 == 0) — no select needed.
    """
    pad = jnp.full((s, x.shape[1]), fill, x.dtype)
    return jnp.concatenate([pad, x[:-s]], axis=0)


def _cummax_sublanes(x, n):
    """Inclusive prefix max along axis 0 (length n, power-of-2 padded ok)."""
    s = 1
    while s < n:
        x = jnp.maximum(x, _shift_down(x, s, NEG16))
        s *= 2
    return x


def _dp_kernel(qT_ref, rT_ref, qlen_ref, rlen_ref, se_ref,
               score_ref, qpos_ref, rpos_ref, trace_ref,
               h_ref, e_ref, el_ref, ebits_ref, hroll_ref,
               best_ref, hend_ref,
               *, QT, RT, sub, go, ge, goL, geL,
               all_start_end, with_trace):
    r = pl.program_id(1)
    qio = jax.lax.broadcasted_iota(jnp.int32, (QT, LANES), 0)

    @pl.when(r == 0)
    def _init():
        h_ref[:] = jnp.zeros((QT, LANES), jnp.int32)
        hroll_ref[:] = jnp.zeros((QT, LANES), jnp.int32)
        e_ref[:] = jnp.full((QT, LANES), go, jnp.int32)
        el_ref[:] = jnp.full((QT, LANES), goL, jnp.int32)
        ebits_ref[:] = jnp.full((QT, LANES),
                                gact.E_OPEN8 + gact.EL_OPEN8, jnp.int32)
        best_ref[:] = jnp.zeros((3, LANES), jnp.int32)
        hend_ref[:] = jnp.zeros((1, LANES), jnp.int32)

    # current ref row out of the 8-row block (dynamic sublane loads on int8
    # aren't supported by Mosaic -> select-reduce over the 8 rows)
    rows8 = rT_ref[:].astype(jnp.int32)                  # (8, LANES)
    row8io = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    rc = jnp.max(jnp.where(row8io == r % 8, rows8, -1),
                 axis=0, keepdims=True)                  # (1, LANES)
    # substitution profile on the fly (CreateVProfile, Processor.cpp:87-115):
    # per-lane sub-matrix column for rc via (1,LANES) selects, then one
    # select chain over the query codes — no per-block profile scratch, so
    # large-tile variants (QT up to 1984) stay inside VMEM.
    qc = qT_ref[:].astype(jnp.int32)                     # (QT, LANES)
    subrow = []
    for qv in range(5):
        srv = jnp.full((1, LANES), int(sub[qv][0]), jnp.int32)
        for c in range(1, 5):
            srv = jnp.where(rc == c, int(sub[qv][c]), srv)
        subrow.append(srv)
    prof = jnp.broadcast_to(subrow[0], (QT, LANES))
    for qv in range(1, 5):
        prof = jnp.where(qc == qv, subrow[qv], prof)

    h_prev_roll = hroll_ref[:]
    e = e_ref[:]
    el = el_ref[:]

    dag = jnp.maximum(h_prev_roll + prof, 0)
    hp = jnp.maximum(jnp.maximum(dag, e), el)

    # within-column gaps: F(q) = go + ge*(q-1) + max_{j<q}(hp(j) - ge*j)
    # with the j = -1 boundary folded in as row 0 (see
    # gact._column_gaps_prefix).
    hp_sh = _shift_down(hp, 1, 0)
    arow = qio - 1                                       # j = q-1
    f = go + ge * arow + _cummax_sublanes(hp_sh - ge * arow, QT)
    fl = goL + geL * arow + _cummax_sublanes(hp_sh - geL * arow, QT)
    h = jnp.maximum(hp, jnp.maximum(f, fl))

    if with_trace:
        # 8-bit trace word; identical priority chain to gact.batch_align
        is_d = h == dag
        is_f = h == f
        is_fl = h == fl
        is_el = h == el
        t = jnp.full((QT, LANES), gact.T8_DEL, jnp.int32)
        t = jnp.where(is_d, jnp.where(h == 0, gact.T8_ZERO, gact.T8_DIAG), t)
        t = jnp.where(is_fl, gact.T8_INS_L, t)
        t = jnp.where(is_el, gact.T8_DEL_L, t)
        t = jnp.where(~is_d & ~is_f & is_fl, gact.T8_INS_L, t)
        t = jnp.where(~is_d & is_f, gact.T8_INS, t)

        h_up = _shift_down(h, 1, 0)
        f_up = _shift_down(f, 1, NEG16)
        fl_up = _shift_down(fl, 1, NEG16)
        fbits = jnp.where(h_up + go > f_up + ge, gact.F_OPEN8, 0)
        flbits = jnp.where(h_up + goL > fl_up + geL, gact.FL_OPEN8, 0)
        word = t + fbits + flbits + ebits_ref[:]
        trace_ref[0] = word.astype(jnp.uint8)
    else:
        h_up = _shift_down(h, 1, 0)

    e_open = h + go
    e_ext = e + ge
    el_open = h + goL
    el_ext = el + geL
    ebits_ref[:] = (jnp.where(e_open > e_ext, gact.E_OPEN8, 0)
                    + jnp.where(el_open > el_ext, gact.EL_OPEN8, 0))
    e_ref[:] = jnp.maximum(e_open, e_ext)
    el_ref[:] = jnp.maximum(el_open, el_ext)
    h_ref[:] = h
    hroll_ref[:] = h_up

    qlen = qlen_ref[:]                                   # (1, LANES) int32
    rlen = rlen_ref[:]

    if not all_start_end:
        # max tracking: earliest column with a strict improvement, then
        # smallest q within the column (Processor.cpp:502-541)
        valid = (qio < qlen) & (r < rlen)
        hm = jnp.where(valid, h, -1)
        colmax = jnp.max(hm, axis=0, keepdims=True)      # (1, LANES)
        colargq = jnp.min(jnp.where(hm == colmax, qio, QT),
                          axis=0, keepdims=True)
        best = best_ref[0:1]
        improved = colmax > best
        best_ref[0:1] = jnp.where(improved, colmax, best)
        best_ref[1:2] = jnp.where(improved, colargq, best_ref[1:2])
        best_ref[2:3] = jnp.where(improved, r, best_ref[2:3])

    # start_end capture: H at (qlen-1, rlen-1)
    h_at_qend = jnp.max(jnp.where(qio == qlen - 1, h, NEG16),
                        axis=0, keepdims=True)
    hend_ref[:] = jnp.where(r == rlen - 1, h_at_qend, hend_ref[:])

    @pl.when(r == RT - 1)
    def _fin():
        se = se_ref[:] != 0
        if all_start_end:
            score_ref[:] = hend_ref[:]
            qpos_ref[:] = qlen - 1
            rpos_ref[:] = rlen - 1
        else:
            score_ref[:] = jnp.where(se, hend_ref[:], best_ref[0:1])
            qpos_ref[:] = jnp.where(se, qlen - 1, best_ref[1:2])
            rpos_ref[:] = jnp.where(se, rlen - 1, best_ref[2:3])


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("params_static", "with_trace", "all_start_end",
                     "interpret"))
def _dp_call(qcodes, rcodes, qlens, rlens, start_end, params_static,
             with_trace, all_start_end, interpret):
    sub, go, ge, goL, geL = params_static
    B0, QT0 = qcodes.shape
    RT = rcodes.shape[1]
    B = _round_up(B0, LANES)
    QT = _round_up(QT0, 32)
    if B != B0:
        qcodes = jnp.pad(qcodes, ((0, B - B0), (0, 0)))
        rcodes = jnp.pad(rcodes, ((0, B - B0), (0, 0)))
        qlens = jnp.pad(qlens, (0, B - B0), constant_values=1)
        rlens = jnp.pad(rlens, (0, B - B0), constant_values=1)
        start_end = jnp.pad(start_end, (0, B - B0))
    if QT != QT0:
        qcodes = jnp.pad(qcodes, ((0, 0), (0, QT - QT0)))

    qT = qcodes.T                                        # (QT, B)
    rT = rcodes.T                                        # (RT, B)
    qlen2 = qlens.astype(jnp.int32)[None, :]
    rlen2 = rlens.astype(jnp.int32)[None, :]
    se2 = start_end.astype(jnp.int32)[None, :]

    kern = functools.partial(
        _dp_kernel, QT=QT, RT=RT, sub=sub, go=go, ge=ge, goL=goL, geL=geL,
        all_start_end=all_start_end, with_trace=with_trace)

    row_spec = pl.BlockSpec((1, LANES), lambda b, r: (0, b),
                            memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((1, B), jnp.int32),   # score
        jax.ShapeDtypeStruct((1, B), jnp.int32),   # qpos
        jax.ShapeDtypeStruct((1, B), jnp.int32),   # rpos
        jax.ShapeDtypeStruct((RT, QT, B), jnp.uint8),
    ]
    out_specs = [row_spec, row_spec, row_spec,
                 pl.BlockSpec((1, QT, LANES), lambda b, r: (r, 0, b),
                              memory_space=pltpu.VMEM)]
    if not with_trace:
        out_shapes = out_shapes[:3]
        out_specs = out_specs[:3]

        def kern_nt(qT_ref, rT_ref, qlen_ref, rlen_ref, se_ref,
                    score_ref, qpos_ref, rpos_ref, *scratch):
            return kern(qT_ref, rT_ref, qlen_ref, rlen_ref, se_ref,
                        score_ref, qpos_ref, rpos_ref, None, *scratch)
        body = kern_nt
    else:
        body = kern

    try:
        cparams = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
    except TypeError:  # older/newer jax naming
        cparams = None

    out = pl.pallas_call(
        body,
        grid=(B // LANES, RT),
        in_specs=[
            pl.BlockSpec((QT, LANES), lambda b, r: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda b, r: (r // 8, b),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((QT, LANES), jnp.int32),    # h
            pltpu.VMEM((QT, LANES), jnp.int32),    # e
            pltpu.VMEM((QT, LANES), jnp.int32),    # el
            pltpu.VMEM((QT, LANES), jnp.int32),    # ebits
            pltpu.VMEM((QT, LANES), jnp.int32),    # h rolled
            pltpu.VMEM((3, LANES), jnp.int32),     # best score/q/r
            pltpu.VMEM((1, LANES), jnp.int32),     # h_end
        ],
        compiler_params=cparams,
        interpret=interpret,
    )(qT, rT, qlen2, rlen2, se2)

    score, qpos, rpos = out[0][0, :B0], out[1][0, :B0], out[2][0, :B0]
    res = {"score": score, "query_max_pos": qpos, "ref_max_pos": rpos}
    if with_trace:
        res["trace"] = out[3]    # (RT, QT, B) — column-major trace layout
    return res


def _static_params(params: gact.GactParams):
    sub = tuple(tuple(int(v) for v in row) for row in np.asarray(params.sub))
    return (sub, int(params.gap_open), int(params.gap_extend),
            int(params.long_gap_open), int(params.long_gap_extend))


def batch_align(qcodes, rcodes, qlens, rlens, start_end, params,
                with_trace=True, all_start_end=False, interpret=False):
    """Drop-in for gact.batch_align, trace returned in (RT, QT, B) layout
    (use gact.batch_traceback_cols, or transpose for the (RT, B, QT) one)."""
    return _dp_call(qcodes, rcodes, qlens, rlens, start_end,
                    _static_params(params), with_trace, all_start_end,
                    interpret)


def align_and_traceback(qcodes, rcodes, qlens, rlens, start_end, params,
                        max_tb_steps, all_start_end=False, interpret=False):
    """One dispatch DP + batched traceback (Pallas DP, lax traceback)."""
    res = batch_align(qcodes, rcodes, qlens, rlens, start_end, params,
                      with_trace=True, all_start_end=all_start_end,
                      interpret=interpret)
    tb = gact.batch_traceback_cols(
        res["trace"],
        jnp.where(start_end, qlens - 1, res["query_max_pos"]),
        jnp.where(start_end, rlens - 1, res["ref_max_pos"]),
        max_tb_steps, n_valid=qcodes.shape[0])
    return {k: v for k, v in res.items() if k != "trace"} | tb
