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
query dimension rides the sublanes, so one fused step computes 128 tiles x
QT cells of one reference column.  The DP state (H/E/E_L rows, pending gap
open bits) lives in VMEM scratch across the column loop — nothing but the
packed 8-bit trace slab leaves the chip per column, and only compact
score/pos vectors at the end.

The within-column coupled gap recurrence (the reference's lazy-F loop,
Processor.cpp:382-497) is solved exactly by two log-depth prefix maxima
over the sublane axis (see gact._column_gaps_prefix for the derivation),
valid whenever opening is not cheaper than extending.

Grid = (B/128, RT/PCOL) with the column dimension sequential ("arbitrary")
so scratch carries across steps; the batch dimension is parallel.  Each
grid step computes PCOL=8 reference columns with the DP state carried in
vector registers between columns — scratch is read/written once per group,
not once per column.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from darwin_tpu.ops import gact
from darwin_tpu.ops import oracle as _orc

orc_OP_M = int(_orc.OP_M)
orc_OP_D = int(_orc.OP_D)
orc_OP_I = int(_orc.OP_I)

import os as _os

LANES = 128
# ref columns per grid step for standard tiles.  Interleaved A/B on the
# (time-shared) v5e puts 8 slightly ahead of 16 and well ahead of 24/32;
# single-shot runs swing +-20% with tunnel phase, so re-tune via
# DARWIN_TPU_PCOL on dedicated hardware.
PCOL = int(_os.environ.get("DARWIN_TPU_PCOL", "8"))
if PCOL <= 0 or PCOL % 8 != 0:
    # the traceback sweep blocks columns in groups of 8; a non-multiple
    # would silently leave trailing trace columns unswept
    raise ValueError(f"DARWIN_TPU_PCOL must be a positive multiple of 8, "
                     f"got {PCOL}")
NEG16 = -(1 << 28)


def _pick_pcol(qt: int) -> int:
    """Columns per grid step: the unrolled column loop keeps ~20 (QT, 128)
    int32 values live, so large-tile variants (1984x960 escalation tiles,
    software/extender.cpp:70-76) must unroll less to fit the Mosaic stack
    in VMEM."""
    if qt <= 512:
        return PCOL
    return 2 if qt <= 1024 else 1


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


def _gap_slopes(go, ge, goL, geL):
    """Per-lane scan slopes + the cross-lane slope for the generic-scoring
    closed form (see _dp_kernel's gap section)."""
    sf = max(go, ge)
    sfl = max(goL, geL)
    return sf, sfl, max(sf, sfl)


def _dp_kernel(qT_ref, rT_ref, qlen_ref, rlen_ref, se_ref,
               score_ref, qpos_ref, rpos_ref, trace_ref,
               e_ref, el_ref, ebits_ref, hroll_ref,
               best_ref, hend_ref,
               *, QT, n_groups, pcol, sub, go, ge, goL, geL,
               wf, wfl, all_start_end, with_trace, generic=False):
    r = pl.program_id(1)
    qio = jax.lax.broadcasted_iota(jnp.int32, (QT, LANES), 0)

    @pl.when(r == 0)
    def _init():
        hroll_ref[:] = jnp.zeros((QT, LANES), jnp.int32)
        e_ref[:] = jnp.full((QT, LANES), go, jnp.int32)
        el_ref[:] = jnp.full((QT, LANES), goL, jnp.int32)
        ebits_ref[:] = jnp.full((QT, LANES),
                                gact.E_OPEN8 + gact.EL_OPEN8, jnp.int32)
        best_ref[:] = jnp.zeros((3, LANES), jnp.int32)
        hend_ref[:] = jnp.zeros((1, LANES), jnp.int32)

    qc = qT_ref[:].astype(jnp.int32)                     # (QT, LANES)
    rows = rT_ref[:].astype(jnp.int32)                   # (8, LANES)
    row8io = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    qlen = qlen_ref[:]                                   # (1, LANES) int32
    rlen = rlen_ref[:]
    arow = qio - 1                                       # j = q - 1
    q_end = qio == qlen - 1

    # ---- state, register-carried across the PCOL columns of this group ----
    h_prev_roll = hroll_ref[:]
    e = e_ref[:]
    el = el_ref[:]
    ebits = ebits_ref[:]
    best = best_ref[0:1]
    best_q = best_ref[1:2]
    best_r = best_ref[2:3]
    hend = hend_ref[:]

    # Query-side profile columns, loop-invariant (CreateVProfile,
    # Processor.cpp:87-115): scol[c][q, lane] = sub[qcodes[q, lane], c].
    # Built once per grid step from the resident qc registers; per column
    # the profile is then 4 compares + 4 selects against the (1, LANES)
    # ref code instead of a full select chain over the query codes.  Only
    # for standard tiles — large-tile variants (QT up to 1984) can't
    # afford 5 extra (QT, LANES) live values.
    precomp_scol = pcol >= 8 and QT <= 512
    if precomp_scol:
        scol = []
        for cc in range(5):
            pv = jnp.full((QT, LANES), int(sub[0][cc]), jnp.int32)
            for qv in range(1, 5):
                pv = jnp.where(qc == qv, int(sub[qv][cc]), pv)
            scol.append(pv)

    for c in range(pcol):
        rr = r * pcol + c                                # column index
        if pcol >= 8:
            rc = rows[c:c + 1]                           # (1, LANES)
        else:
            # block holds 8 ref rows; select the live one (dynamic sublane
            # loads on int8 aren't supported by Mosaic)
            rc = jnp.max(jnp.where(row8io == (r * pcol) % 8 + c, rows, -1),
                         axis=0, keepdims=True)
        if precomp_scol:
            prof = scol[0]
            for cc in range(1, 5):
                prof = jnp.where(rc == cc, scol[cc], prof)
        else:
            # on-the-fly: per-lane sub-matrix column for rc via (1,LANES)
            # selects, then one select chain over the query codes — no
            # profile registers, so large tiles stay inside VMEM.
            subrow = []
            for qv in range(5):
                srv = jnp.full((1, LANES), int(sub[qv][0]), jnp.int32)
                for cc in range(1, 5):
                    srv = jnp.where(rc == cc, int(sub[qv][cc]), srv)
                subrow.append(srv)
            prof = jnp.broadcast_to(subrow[0], (QT, LANES))
            for qv in range(1, 5):
                prof = jnp.where(qc == qv, subrow[qv], prof)

        dag = jnp.maximum(h_prev_roll + prof, 0)
        hp = jnp.maximum(jnp.maximum(dag, e), el)

        # within-column gaps: F(q) = go + ge*(q-1) + max_{j<q}(hp(j) - ge*j)
        # with the j = -1 boundary folded in as row 0 (see
        # gact._column_gaps_prefix); the dominated lane's scan is windowed
        # (oracle.gap_scan_windows — e.g. 5 instead of 9 shift+max steps
        # for the default scoring's short lane at QT=384)
        hp_sh = _shift_down(hp, 1, 0)
        if not generic:
            f = go + ge * arow + _cummax_sublanes(hp_sh - ge * arow, wf)
            fl = (goL + geL * arow
                  + _cummax_sublanes(hp_sh - geL * arow, wfl))
        else:
            # Generic scoring (open may beat extend; the reference accepts
            # any, software/Processor.cpp:48-80): the coupled recurrence
            #   F(q)   = max(H(q-1)+go,  F(q-1)+ge)
            #   F_L(q) = max(H(q-1)+goL, F_L(q-1)+geL)
            #   H(q)   = max(Hp(q), F(q), F_L(q))
            # is v(q) = A (x) v(q-1) (+) b(q) in max-plus with constant
            #   A = [[max(go,ge), go], [goL, max(goL,geL)]].
            # 2x2 max-plus powers have a closed form (with M = max of the
            # diagonal, and go+goL <= 2M always since M >= go, goL):
            #   A^d[0][0] = max(d*a00, (go+goL) + (d-2)*M)
            #   A^d[0][1] = go  + (d-1)*M     (and symmetrically for row 1)
            # whence each lane is its own-slope prefix scan plus one extra
            # term p3 = go+goL + max_{j<=q-1}(hps(j) + (q-1-j)*M), SHARED
            # by both lanes and itself a 1-shift of the larger-slope scan
            # — two scans + ~4 ops instead of a 6-word max-plus scan.
            # Verified exactly equal to gact._column_gap_scan (and the A^d
            # cross terms are dominated: p2 - p3 = go - M <= 0).
            sf, sfl, M = _gap_slopes(go, ge, goL, geL)
            cmf = _cummax_sublanes(hp_sh - sf * arow, wf)
            cmfl = _cummax_sublanes(hp_sh - sfl * arow, wfl)
            f = go + sf * arow + cmf
            fl = goL + sfl * arow + cmfl
            cm_m = cmf if sf >= sfl else cmfl
            p3 = ((go + goL - M) + M * arow
                  + _shift_down(cm_m, 1, NEG16))
            f = jnp.maximum(f, p3)
            fl = jnp.maximum(fl, p3)
        h = jnp.maximum(hp, jnp.maximum(f, fl))
        h_up = _shift_down(h, 1, 0)

        if with_trace:
            # 8-bit trace word.  The T field is the layered blend chain of
            # gact.batch_align restated as one nested select tree (same
            # truth table, no boolean not/and ops):
            #   is_d branch:  el > fl > diag/zero
            #   else:         f > fl > el > del
            is_d = h == dag
            is_f = h == f
            is_fl = h == fl
            is_el = h == el
            dz = jnp.where(h == 0, gact.T8_ZERO, gact.T8_DIAG)
            td = jnp.where(is_el, gact.T8_DEL_L,
                           jnp.where(is_fl, gact.T8_INS_L, dz))
            tn = jnp.where(is_f, gact.T8_INS,
                           jnp.where(is_fl, gact.T8_INS_L,
                                     jnp.where(is_el, gact.T8_DEL_L,
                                               gact.T8_DEL)))
            t = jnp.where(is_d, td, tn)

            # F/F_L "open" bits of row q compare row q-1's values — compute
            # the predicate unshifted and shift the combined bit field once
            # (row 0's boundary is open for both: h_up=0, f_up=-inf).
            raw = (jnp.where(h + go > f + ge, gact.F_OPEN8, 0)
                   + jnp.where(h + goL > fl + geL, gact.FL_OPEN8, 0))
            word = (t + ebits
                    + _shift_down(raw, 1, gact.F_OPEN8 + gact.FL_OPEN8))
            trace_ref[c] = word.astype(jnp.uint8)

        e_open = h + go
        e_ext = e + ge
        el_open = h + goL
        el_ext = el + geL
        if with_trace:
            # only the next column's trace word reads these
            ebits = (jnp.where(e_open > e_ext, gact.E_OPEN8, 0)
                     + jnp.where(el_open > el_ext, gact.EL_OPEN8, 0))
        e = jnp.maximum(e_open, e_ext)
        el = jnp.maximum(el_open, el_ext)
        h_prev_roll = h_up

        if not all_start_end:
            # max tracking: earliest column with a strict improvement, then
            # smallest q within the column (Processor.cpp:502-541)
            valid = (qio < qlen) & (rr < rlen)
            hm = jnp.where(valid, h, -1)
            colmax = jnp.max(hm, axis=0, keepdims=True)  # (1, LANES)
            colargq = jnp.min(jnp.where(hm == colmax, qio, QT),
                              axis=0, keepdims=True)
            improved = colmax > best
            best = jnp.where(improved, colmax, best)
            best_q = jnp.where(improved, colargq, best_q)
            best_r = jnp.where(improved, rr, best_r)

        # start_end capture: H at (qlen-1, rlen-1).  The (QT, L) masked
        # reduce only matters in each lane's LAST column — guard it on a
        # scalar so the other pcol-1 columns skip the work entirely.
        def _cap(hh, hend_in):
            h_at_qend = jnp.max(jnp.where(q_end, hh, NEG16),
                                axis=0, keepdims=True)
            return jnp.where(rr == rlen - 1, h_at_qend, hend_in)

        hend = jax.lax.cond(jnp.any(rlen == rr + 1), _cap,
                            lambda hh, hend_in: hend_in, h, hend)

    e_ref[:] = e
    el_ref[:] = el
    if with_trace:
        ebits_ref[:] = ebits
    hroll_ref[:] = h_prev_roll
    if not all_start_end:
        best_ref[0:1] = best
        best_ref[1:2] = best_q
        best_ref[2:3] = best_r
    hend_ref[:] = hend

    @pl.when(r == n_groups - 1)
    def _fin():
        se = se_ref[:] != 0
        if all_start_end:
            score_ref[:] = hend
            qpos_ref[:] = qlen - 1
            rpos_ref[:] = rlen - 1
        else:
            score_ref[:] = jnp.where(se, hend, best)
            qpos_ref[:] = jnp.where(se, qlen - 1, best_q)
            rpos_ref[:] = jnp.where(se, rlen - 1, best_r)


def _round_up(x, m):
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Large-tile strip kernel
# ---------------------------------------------------------------------------
#
# The 1984x960 escalation tiles (software/extender.cpp:70-76) don't fit the
# standard kernel's register budget (~20 live (QT,128) int32 values), which
# previously forced pcol=1 and ~6x worse per-cell cost.  Instead the query
# axis is split into strips of SQT=512 rows processed by a 3-D grid
# (batch, strip, column-group): each strip sweeps all columns at full
# pcol=8 efficiency, and the strip boundary state is carried per column in
# VMEM scratch (never HBM):
#   hb[r]   H at the strip's last row, column r       (next strip's dag /
#           h_prev_roll row-0 fill)
#   mf[r]   gap-scan prefix carry for the short lane  (window-tail when
#           the lane is windowed — older terms are in the dominated-length
#           never-read class, oracle.gap_scan_windows)
#   mfl[r]  same for the long lane (accumulated when un-windowed)
#   rawl[r] last row's F/F_L open-bit predicates      (next strip's trace
#           row-0 shift fill)
# Each strip reads a column's carry before overwriting it, so one buffer
# per quantity serves all strips.  Strip mode requires all_start_end (the
# production large-tile dispatch; max-cell tracking would need cross-strip
# column maxima).

def _dp_strip_kernel(qT_ref, rT_ref, qlen_ref, rlen_ref,
                     score_ref, qpos_ref, rpos_ref, trace_ref,
                     e_ref, el_ref, ebits_ref, hroll_ref, hend_ref,
                     hb_ref, mf_ref, mfl_ref, rawl_ref, p3m_ref,
                     *, SQT, n_strips, n_groups, pcol, sub, go, ge, goL,
                     geL, wf, wfl, with_trace, generic=False):
    s = pl.program_id(1)
    r = pl.program_id(2)
    qio = jax.lax.broadcasted_iota(jnp.int32, (SQT, LANES), 0)
    qoff = s * SQT

    @pl.when(r == 0)
    def _init_strip():
        hroll_ref[:] = jnp.zeros((SQT, LANES), jnp.int32)
        e_ref[:] = jnp.full((SQT, LANES), go, jnp.int32)
        el_ref[:] = jnp.full((SQT, LANES), goL, jnp.int32)
        ebits_ref[:] = jnp.full((SQT, LANES),
                                gact.E_OPEN8 + gact.EL_OPEN8, jnp.int32)

    @pl.when((s == 0) & (r == 0))
    def _init_once():
        hend_ref[:] = jnp.zeros((1, LANES), jnp.int32)

    qc = qT_ref[:].astype(jnp.int32)                     # (SQT, LANES)
    rows = rT_ref[:].astype(jnp.int32)                   # (8, LANES)
    qlen = qlen_ref[:]                                   # (1, LANES)
    rlen = rlen_ref[:]
    first = s == 0
    arow = qio + qoff - 1                                # global j = q - 1
    q_end = (qio + qoff) == qlen - 1
    hend = hend_ref[:]

    h_prev_roll = hroll_ref[:]
    e = e_ref[:]
    el = el_ref[:]
    ebits = ebits_ref[:]

    scol = []
    for cc in range(5):
        pv = jnp.full((SQT, LANES), int(sub[0][cc]), jnp.int32)
        for qv in range(1, 5):
            pv = jnp.where(qc == qv, int(sub[qv][cc]), pv)
        scol.append(pv)

    for c in range(pcol):
        rr = r * pcol + c
        rc = rows[c:c + 1]
        prof = scol[0]
        for cc in range(1, 5):
            prof = jnp.where(rc == cc, scol[cc], prof)

        dag = jnp.maximum(h_prev_roll + prof, 0)
        hp = jnp.maximum(jnp.maximum(dag, e), el)

        # gap scans with strip carries.  Local a-term k covers global
        # t = qoff + k + 1, so C = cummax(a)[ql-1] plus the carried
        # M(qoff) reproduces the full prefix (see _column_gaps_prefix).
        def lane_scan(open_, ext, w, m_ref, windowed):
            a = hp - ext * (qio + qoff)
            cm = _cummax_sublanes(a, w)
            m_in = jnp.where(first, jnp.int32(ext),
                             m_ref[pl.ds(rr, 1)][0])     # M at strip top
            sh1 = jnp.maximum(_shift_down(cm, 1, NEG16), m_in)
            val = open_ + ext * arow + sh1
            m_out = cm[SQT - 1:SQT]
            if not windowed:
                m_out = jnp.maximum(m_out, m_in)
            m_ref[pl.ds(rr, 1)] = m_out
            return val, sh1

        if not generic:
            f, _ = lane_scan(go, ge, wf, mf_ref, wf < SQT)
            fl, _ = lane_scan(goL, geL, wfl, mfl_ref, wfl < SQT)
        else:
            # generic-scoring closed form (see _dp_kernel): own-slope
            # scans plus the shared cross-lane term p3, whose 1-shifted
            # prefix crosses strips through the p3m carry
            sf, sfl, M = _gap_slopes(go, ge, goL, geL)
            f, shf = lane_scan(go, sf, SQT, mf_ref, False)
            fl, shfl = lane_scan(goL, sfl, SQT, mfl_ref, False)
            sh_m = shf if sf >= sfl else shfl
            p3m_in = jnp.where(first, NEG16, p3m_ref[pl.ds(rr, 1)][0])
            p3 = ((go + goL - M) + M * arow
                  + jnp.where(qio == 0, p3m_in,
                              _shift_down(sh_m, 1, NEG16)))
            p3m_ref[pl.ds(rr, 1)] = sh_m[SQT - 1:SQT]
            f = jnp.maximum(f, p3)
            fl = jnp.maximum(fl, p3)
        h = jnp.maximum(hp, jnp.maximum(f, fl))

        hb_in = jnp.where(first, 0, hb_ref[pl.ds(rr, 1)][0])
        hb_ref[pl.ds(rr, 1)] = h[SQT - 1:SQT]

        if with_trace:
            is_d = h == dag
            is_f = h == f
            is_fl = h == fl
            is_el = h == el
            dz = jnp.where(h == 0, gact.T8_ZERO, gact.T8_DIAG)
            td = jnp.where(is_el, gact.T8_DEL_L,
                           jnp.where(is_fl, gact.T8_INS_L, dz))
            tn = jnp.where(is_f, gact.T8_INS,
                           jnp.where(is_fl, gact.T8_INS_L,
                                     jnp.where(is_el, gact.T8_DEL_L,
                                               gact.T8_DEL)))
            t = jnp.where(is_d, td, tn)
            raw = (jnp.where(h + go > f + ge, gact.F_OPEN8, 0)
                   + jnp.where(h + goL > fl + geL, gact.FL_OPEN8, 0))
            raw_in = jnp.where(first,
                               gact.F_OPEN8 + gact.FL_OPEN8,
                               rawl_ref[pl.ds(rr, 1)][0])
            rawl_ref[pl.ds(rr, 1)] = raw[SQT - 1:SQT]
            word = t + ebits + jnp.where(
                qio == 0, raw_in, _shift_down(raw, 1, 0))
            trace_ref[c] = word.astype(jnp.uint8)

        e_open = h + go
        e_ext = e + ge
        el_open = h + goL
        el_ext = el + geL
        if with_trace:
            ebits = (jnp.where(e_open > e_ext, gact.E_OPEN8, 0)
                     + jnp.where(el_open > el_ext, gact.EL_OPEN8, 0))
        e = jnp.maximum(e_open, e_ext)
        el = jnp.maximum(el_open, el_ext)
        h_prev_roll = _shift_down(h, 1, 0)
        h_prev_roll = jnp.where(qio == 0, hb_in, h_prev_roll)

        q_in = (qlen - 1 >= qoff) & (qlen - 1 < qoff + SQT)
        at_end = (rr == rlen - 1) & q_in
        h_at_qend = jnp.max(jnp.where(q_end, h, NEG16),
                            axis=0, keepdims=True)
        hend = jnp.where(at_end, h_at_qend, hend)

    e_ref[:] = e
    el_ref[:] = el
    if with_trace:
        ebits_ref[:] = ebits
    hroll_ref[:] = h_prev_roll
    hend_ref[:] = hend

    @pl.when((s == n_strips - 1) & (r == n_groups - 1))
    def _fin():
        score_ref[:] = hend
        qpos_ref[:] = qlen - 1
        rpos_ref[:] = rlen - 1


@functools.partial(jax.jit, static_argnames=("params_static", "with_trace",
                                             "interpret"))
def _dp_call_strips(qcodes, rcodes, qlens, rlens, params_static,
                    with_trace, interpret):
    """Strip-mode DP for large (QT > 512) all-start_end tiles."""
    sub, go, ge, goL, geL = params_static
    B0, QT0 = qcodes.shape
    RT0 = rcodes.shape[1]
    SQT = 512
    n_strips = -(-QT0 // SQT)
    QT = n_strips * SQT
    B = _round_up(B0, LANES)
    pcol = 8
    RT = _round_up(RT0, pcol)
    if B != B0:
        qcodes = jnp.pad(qcodes, ((0, B - B0), (0, 0)))
        rcodes = jnp.pad(rcodes, ((0, B - B0), (0, 0)))
        qlens = jnp.pad(qlens, (0, B - B0), constant_values=1)
        rlens = jnp.pad(rlens, (0, B - B0), constant_values=1)
    if QT != QT0:
        qcodes = jnp.pad(qcodes, ((0, 0), (0, QT - QT0)))
    if RT != RT0:
        rcodes = jnp.pad(rcodes, ((0, 0), (0, RT - RT0)))
    qT = qcodes.T
    rT = rcodes.T
    qlen2 = qlens.astype(jnp.int32)[None, :]
    rlen2 = rlens.astype(jnp.int32)[None, :]
    n_groups = RT // pcol
    # strips carry the full prefix exactly; window only below strip height
    generic = not (go <= ge and goL <= geL)
    if generic:
        wf = wfl = SQT
    else:
        wf, wfl = _orc.gap_scan_windows(go, ge, goL, geL, SQT)

    kern = functools.partial(
        _dp_strip_kernel, SQT=SQT, n_strips=n_strips, n_groups=n_groups,
        pcol=pcol, sub=sub, go=go, ge=ge, goL=goL, geL=geL, wf=wf, wfl=wfl,
        with_trace=with_trace, generic=generic)
    row_spec = pl.BlockSpec((1, LANES), lambda b, s, r: (0, b),
                            memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((1, B), jnp.int32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
    ]
    out_specs = [row_spec, row_spec, row_spec]
    if with_trace:
        out_shapes.append(jax.ShapeDtypeStruct((RT, QT, B), jnp.uint8))
        out_specs.append(
            pl.BlockSpec((pcol, SQT, LANES), lambda b, s, r: (r, s, b),
                         memory_space=pltpu.VMEM))
        body = kern
    else:
        def body(qT_ref, rT_ref, qlen_ref, rlen_ref,
                 score_ref, qpos_ref, rpos_ref, *scratch):
            return kern(qT_ref, rT_ref, qlen_ref, rlen_ref,
                        score_ref, qpos_ref, rpos_ref, None, *scratch)

    try:
        cparams = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"))
    except TypeError:
        cparams = None
    out = pl.pallas_call(
        body,
        grid=(B // LANES, n_strips, n_groups),
        in_specs=[
            pl.BlockSpec((SQT, LANES), lambda b, s, r: (s, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda b, s, r: (r, b),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((SQT, LANES), jnp.int32),   # e
            pltpu.VMEM((SQT, LANES), jnp.int32),   # el
            pltpu.VMEM((SQT, LANES), jnp.int32),   # ebits
            pltpu.VMEM((SQT, LANES), jnp.int32),   # h rolled
            pltpu.VMEM((1, LANES), jnp.int32),     # h_end
            pltpu.VMEM((RT, LANES), jnp.int32),    # hb carry
            pltpu.VMEM((RT, LANES), jnp.int32),    # mf carry
            pltpu.VMEM((RT, LANES), jnp.int32),    # mfl carry
            pltpu.VMEM((RT, LANES), jnp.int32),    # rawl carry
            pltpu.VMEM((RT, LANES), jnp.int32),    # p3m carry (generic)
        ],
        compiler_params=cparams,
        interpret=interpret,
    )(qT, rT, qlen2, rlen2)

    score, qpos, rpos = out[0][0, :B0], out[1][0, :B0], out[2][0, :B0]
    res = {"score": score, "query_max_pos": qpos, "ref_max_pos": rpos}
    if with_trace:
        res["trace"] = out[3]
    return res


# ---------------------------------------------------------------------------
# Pallas traceback: backward column sweep
# ---------------------------------------------------------------------------
#
# The serial traceback (gact.batch_traceback*) chases one pointer per lane
# per step — B x path_length dependent HBM gathers, ~12ns each, which made
# it as expensive as the whole DP.  TPU-natively the walk is re-expressed as
# a *backward sweep over ref columns*: the path's column index j decreases
# by exactly one per M/D op, so at any moment every active lane sits in the
# same global column.  The sweep streams the (QT, LANES) trace slab of each
# column through VMEM (sequential DMA at full bandwidth) and extracts each
# lane's word with a masked reduce over sublanes — dense vector ops, no
# gathers.  Within a column a lane consumes a run of I ops (i decreases,
# j fixed) and then one closing M or D op (or terminates); the kernel emits
# one int32 record per (column, lane):
#
#     bits 0..13  nI       number of I ops emitted in this column
#     bits 14..15 closing  0 = walk ended here (or never visited),
#                          OP_M / OP_D otherwise
#
# (14+2 bits so a record survives an int16 device->host transfer — the
# packed result matrix is the per-round fetch and bytes are the cost)
#
# expanded on the host (vectorized np.repeat) into the exact op sequence of
# the serial walker — same state machine, same caps (Processor.cpp:585-716).

_TB_DIAG = gact.T8_DIAG
_TB_DONE = 0


def _tb_kernel(trace_ref, sq_ref, sr_ref, rec_ref, qsteps_ref, rsteps_ref,
               spill_ref, st_ref, i_ref, qs_ref, rs_ref, sp_ref, *,
               QT, n_groups, pcol, max_tb):
    """Run-consuming traceback sweep: two fixed vectorized stages per
    column, no data-dependent while loop (the per-iteration scalar-sync
    cost of the while-based kernel was ~70% of the DP itself).

    Key invariants: an I-run never crosses a column (I ops keep j fixed)
    and, within a column, the walk is [optional I-run] then [one closing
    M/D op] — stage A consumes the whole run via a masked search for the
    nearest set open bit, stage B emits the closing op.  A second run in
    the same column (possible only on exact gap-lane ties under the
    supported go<=ge scorings, see ops/gact.py) sets the spill flag; the
    caller re-runs the while-based safe kernel (_tb_kernel_safe)."""
    r = pl.program_id(1)
    qio = jax.lax.broadcasted_iota(jnp.int32, (QT, LANES), 0)

    @pl.when(r == 0)
    def _init():
        st_ref[:] = jnp.full((1, LANES), _TB_DONE, jnp.int32)
        i_ref[:] = jnp.zeros((1, LANES), jnp.int32)
        qs_ref[:] = jnp.zeros((1, LANES), jnp.int32)
        rs_ref[:] = jnp.zeros((1, LANES), jnp.int32)
        sp_ref[:] = jnp.zeros((1, LANES), jnp.int32)

    sq = sq_ref[:]
    sr = sr_ref[:]

    # Static-trip fori over the group's columns: compiles to a hardware
    # loop (no per-iteration scalar sync, unlike the data-dependent while
    # of _tb_kernel_safe) and keeps the program graph compact.
    def column(k, carry):
        st, i, qs, rs, sp = carry
        c = pcol - 1 - k
        jglob = (n_groups - 1 - r) * pcol + c
        newly = sr == jglob
        i = jnp.where(newly, sq, i)
        st = jnp.where(newly, _TB_DIAG, st)

        words = trace_ref[pl.ds(c, 1)][0].astype(jnp.int32)  # (QT, LANES)

        # ---- stage A: close, or consume a whole I-run ----
        ended = (qs >= max_tb) | (rs >= max_tb) | (i < 0)
        st = jnp.where(ended, _TB_DONE, st)
        act = st != _TB_DONE
        w = jnp.max(jnp.where(qio == i, words, 0), axis=0, keepdims=True)
        eff = jnp.where(st == _TB_DIAG, w & 7, st)
        is_m = act & (eff == gact.T8_DIAG)
        is_dcl = act & ((eff == gact.T8_DEL) | (eff == gact.T8_DEL_L))
        is_run = act & ((eff == gact.T8_INS) | (eff == gact.T8_INS_L))
        is_zero = act & (eff == _TB_DONE)

        one_m = is_m.astype(jnp.int32)
        qs = qs + one_m
        rs = rs + one_m + is_dcl.astype(jnp.int32)
        i = i - one_m
        open_d = jnp.where(eff == gact.T8_DEL, w & gact.E_OPEN8,
                           w & gact.EL_OPEN8)
        st_after_d = jnp.where(open_d != 0, _TB_DIAG, eff)
        closing0 = jnp.where(is_m, orc_OP_M, jnp.where(is_dcl, orc_OP_D, 0))

        # The run-consumption scan + stage B only matter when some lane is
        # actually in an I-run this column; on match-heavy columns (no
        # runs anywhere) the guard skips ~half the sweep's vector work.
        def _with_runs(st, i, qs, rs, sp):
            bitsel = jnp.where(eff == gact.T8_INS, gact.F_OPEN8,
                               gact.FL_OPEN8)
            cand = jnp.where(((words & bitsel) != 0) & (qio <= i), qio, -1)
            qp = jnp.max(cand, axis=0, keepdims=True)
            cnt_raw = i - qp + 1
            cnt = jnp.minimum(cnt_raw, max_tb - qs)
            capped = is_run & (cnt < cnt_raw)
            nI = jnp.where(is_run, cnt, 0)
            qs = qs + nI
            i = i - nI
            st = jnp.where(is_zero | capped, _TB_DONE,
                           jnp.where(is_dcl, st_after_d,
                                     jnp.where(is_m | is_run, _TB_DIAG,
                                               st)))

            # ---- stage B: closing op for lanes that consumed a run ----
            actB = is_run & ~capped
            endedB = (i < 0) | (qs >= max_tb) | (rs >= max_tb)
            st = jnp.where(actB & endedB, _TB_DONE, st)
            actB = actB & ~endedB
            wB = jnp.max(jnp.where(qio == i, words, 0), axis=0,
                         keepdims=True)
            tfB = wB & 7
            is_mB = actB & (tfB == gact.T8_DIAG)
            is_dB = actB & ((tfB == gact.T8_DEL) | (tfB == gact.T8_DEL_L))
            is_zB = actB & (tfB == _TB_DONE)
            sp = sp | (actB & ((tfB == gact.T8_INS)
                               | (tfB == gact.T8_INS_L))).astype(jnp.int32)
            one_mB = is_mB.astype(jnp.int32)
            qs = qs + one_mB
            rs = rs + one_mB + is_dB.astype(jnp.int32)
            i = i - one_mB
            open_dB = jnp.where(tfB == gact.T8_DEL, wB & gact.E_OPEN8,
                                wB & gact.EL_OPEN8)
            stB_after_d = jnp.where(open_dB != 0, _TB_DIAG, tfB)
            st = jnp.where(is_zB, _TB_DONE,
                           jnp.where(is_dB, stB_after_d, st))
            closing = jnp.where(is_mB, orc_OP_M,
                                jnp.where(is_dB, orc_OP_D, closing0))
            return st, i, qs, rs, sp, closing, nI

        def _no_runs(st, i, qs, rs, sp):
            st = jnp.where(is_zero, _TB_DONE,
                           jnp.where(is_dcl, st_after_d,
                                     jnp.where(is_m, _TB_DIAG, st)))
            return (st, i, qs, rs, sp, closing0,
                    jnp.zeros((1, LANES), jnp.int32))

        st, i, qs, rs, sp, closing, nI = jax.lax.cond(
            jnp.any(is_run), _with_runs, _no_runs, st, i, qs, rs, sp)

        rec_ref[pl.ds(c, 1)] = nI + (closing << 14)
        return (st, i, qs, rs, sp)

    st, i, qs, rs, sp = jax.lax.fori_loop(
        0, pcol, column,
        (st_ref[:], i_ref[:], qs_ref[:], rs_ref[:], sp_ref[:]))

    st_ref[:] = st
    i_ref[:] = i
    qs_ref[:] = qs
    rs_ref[:] = rs
    sp_ref[:] = sp

    @pl.when(r == n_groups - 1)
    def _fin():
        qsteps_ref[:] = qs
        rsteps_ref[:] = rs
        spill_ref[:] = sp


def _tb_kernel_safe(trace_ref, sq_ref, sr_ref, rec_ref, qsteps_ref,
                    rsteps_ref, spill_ref, st_ref, i_ref, qs_ref, rs_ref,
                    sp_ref, *, QT, n_groups, pcol, max_tb):
    r = pl.program_id(1)
    qio = jax.lax.broadcasted_iota(jnp.int32, (QT, LANES), 0)

    @pl.when(r == 0)
    def _init():
        st_ref[:] = jnp.full((1, LANES), _TB_DONE, jnp.int32)
        i_ref[:] = jnp.zeros((1, LANES), jnp.int32)
        qs_ref[:] = jnp.zeros((1, LANES), jnp.int32)
        rs_ref[:] = jnp.zeros((1, LANES), jnp.int32)
        sp_ref[:] = jnp.zeros((1, LANES), jnp.int32)

    st = st_ref[:]
    i = i_ref[:]
    qs = qs_ref[:]
    rs = rs_ref[:]
    sq = sq_ref[:]
    sr = sr_ref[:]

    for c in range(pcol - 1, -1, -1):
        jglob = (n_groups - 1 - r) * pcol + c
        # activate lanes whose walk starts at this column
        newly = sr == jglob
        i = jnp.where(newly, sq, i)
        st = jnp.where(newly, _TB_DIAG, st)

        words = trace_ref[c].astype(jnp.int32)           # (QT, LANES)

        def cond(carry):
            st, i, qs, rs, nI, closing, closed = carry
            working = (st != _TB_DONE) & (closed == 0)
            return jnp.any(working)

        def body(carry):
            st, i, qs, rs, nI, closing, closed = carry
            working = (st != _TB_DONE) & (closed == 0)
            # caps + bounds checked at loop top (Processor.cpp:613-618)
            ended = (qs == max_tb) | (rs == max_tb) | (i < 0)
            st = jnp.where(working & ended, _TB_DONE, st)
            working = working & ~ended

            w = jnp.max(jnp.where(qio == i, words, 0), axis=0,
                        keepdims=True)                   # per-lane word
            tf = w & 7
            eff = jnp.where(st == _TB_DIAG, tf, st)
            is_m = working & (eff == gact.T8_DIAG)
            is_d = working & ((eff == gact.T8_DEL) | (eff == gact.T8_DEL_L))
            is_i = working & ((eff == gact.T8_INS) | (eff == gact.T8_INS_L))
            is_zero = working & (eff == _TB_DONE)

            open_bit = jnp.where(eff == gact.T8_DEL, w & gact.E_OPEN8,
                        jnp.where(eff == gact.T8_INS, w & gact.F_OPEN8,
                         jnp.where(eff == gact.T8_DEL_L, w & gact.EL_OPEN8,
                          jnp.where(eff == gact.T8_INS_L,
                                    w & gact.FL_OPEN8, 1))))
            nst = jnp.where(is_m | (open_bit != 0), _TB_DIAG, eff)

            qs = qs + jnp.where(is_m | is_i, 1, 0)
            rs = rs + jnp.where(is_m | is_d, 1, 0)
            i = i - jnp.where(is_m | is_i, 1, 0)
            nI = nI + jnp.where(is_i, 1, 0)
            closing = jnp.where(is_m, orc_OP_M,
                                jnp.where(is_d, orc_OP_D, closing))
            closed = jnp.where(is_m | is_d, 1, closed)
            st = jnp.where(is_zero, _TB_DONE, jnp.where(working, nst, st))
            return (st, i, qs, rs, nI, closing, closed)

        zeros = jnp.zeros((1, LANES), jnp.int32)
        st, i, qs, rs, nI, closing, _ = jax.lax.while_loop(
            cond, body, (st, i, qs, rs, zeros, zeros, zeros))
        rec_ref[c:c + 1] = nI + (closing << 14)

    st_ref[:] = st
    i_ref[:] = i
    qs_ref[:] = qs
    rs_ref[:] = rs

    @pl.when(r == n_groups - 1)
    def _fin():
        qsteps_ref[:] = qs
        rsteps_ref[:] = rs
        # the while-based walker handles multi-run columns directly and
        # therefore never spills
        spill_ref[:] = jnp.zeros((1, LANES), jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("max_tb", "interpret", "safe"))
def _tb_call(trace, start_q, start_r, max_tb, interpret, safe=False):
    RT, QT, B = trace.shape
    pcol = 8          # the sweep's live set is small at any QT
    n_groups = RT // pcol
    sq = start_q.astype(jnp.int32)[None, :]
    sr = start_r.astype(jnp.int32)[None, :]
    if sq.shape[1] != B:
        sq = jnp.pad(sq, ((0, 0), (0, B - sq.shape[1])), constant_values=-1)
        sr = jnp.pad(sr, ((0, 0), (0, B - sr.shape[1])), constant_values=-1)

    kern = functools.partial(_tb_kernel_safe if safe else _tb_kernel,
                             QT=QT, n_groups=n_groups,
                             pcol=pcol, max_tb=max_tb)
    row_spec = pl.BlockSpec((1, LANES), lambda b, r: (0, b),
                            memory_space=pltpu.VMEM)
    try:
        cparams = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
    except TypeError:
        cparams = None
    rec, qsteps, rsteps, spill = pl.pallas_call(
        kern,
        grid=(B // LANES, n_groups),
        in_specs=[
            pl.BlockSpec((pcol, QT, LANES),
                         lambda b, r: (n_groups - 1 - r, 0, b),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec,
        ],
        out_specs=[
            pl.BlockSpec((pcol, LANES), lambda b, r: (n_groups - 1 - r, b),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((RT, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.int32)] * 5,
        compiler_params=cparams,
        interpret=interpret,
    )(trace, sq, sr)
    return rec, qsteps[0], rsteps[0], spill[0]


def _compact_records(rec, bits: int = 8):
    """Pack (RT, B) int32 traceback records (14-bit nI | closing << 14)
    16//bits per entry as bits-wide records ((bits-2)-bit nI | closing in
    the top 2 bits), cutting the device->host result bytes of the fused
    dispatch programs 2x (bits=8) or 4x (bits=4; cf. the RTL's 4-bit
    direction words, RTL/GACT/SmithWatermanPE.v:149-201 — 2 bits name the
    op, the rest carry the insert run).  Returns ((ceil(RT/per), B) int32
    holding the record group in bits 0..15, (B,) int32 overflow flags:
    nonzero when any of the lane's insert runs exceeds the nI field — the
    dispatcher reruns those lanes through the wide layout, so the
    compaction is lossless end to end."""
    per = 16 // bits
    nmax = (1 << (bits - 2)) - 1
    nI = rec & 0x3FFF
    cl = (rec >> 14) & 0x3
    ovf = jnp.any(nI > nmax, axis=0).astype(jnp.int32)
    r = jnp.minimum(nI, nmax) | (cl << (bits - 2))
    pad = -r.shape[0] % per
    if pad:
        # padded all-zero records expand to zero ops — harmless
        r = jnp.pad(r, ((0, pad), (0, 0)))
    out = r[0::per]
    for i in range(1, per):
        out = out | (r[i::per] << (bits * i))
    return out, ovf


def _expand_records(rec: np.ndarray, n_valid: int, L: int):
    """Expand per-column (nI, closing) records into the serial walker's op
    arrays — vectorized np.repeat, no per-op Python loop.

    rec: (RT, B) int32.  Returns ops (n_valid, L) uint8 + n_ops (n_valid,).
    """
    w = np.asarray(rec)[:, :n_valid].astype(np.int64) & 0xFFFF
    return _expand_ops(w & 0x3FFF, (w >> 14) & 0x3, L)


def _expand_records_packed(crec: np.ndarray, n_valid: int, L: int,
                           bits: int = 8):
    """_expand_records for the compact 16//bits-per-entry layout produced
    by _compact_records(bits)."""
    per = 16 // bits
    mask = (1 << bits) - 1
    w = np.asarray(crec)[:, :n_valid].astype(np.int64) & 0xFFFF
    R2, n = w.shape
    r = np.empty((per * R2, n), np.int64)
    for i in range(per):
        r[i::per] = (w >> (bits * i)) & mask
    nmask = (1 << (bits - 2)) - 1
    return _expand_ops(r & nmask, (r >> (bits - 2)) & 0x3, L)


def _expand_ops(nI: np.ndarray, closing: np.ndarray, L: int):
    """Shared record-expansion core: (RT, n) insert-run lengths + closing
    ops -> (n, L) uint8 op arrays + true op counts."""
    RT, n_valid = nI.shape
    # walk order per lane: columns start_r, start_r-1, ..., 0 -> reorder
    # rows by descending column index.  Columns above start_r and columns
    # after the walk terminated hold all-zero records (the kernel only
    # writes for active lanes), so no extra masking is needed.
    nI_d = nI[::-1]
    cl_d = closing[::-1]

    # token stream per lane: for each visited column, nI I-ops then the
    # closing op (if any).  Build lane-major (B, RT, 2) counts+values.
    cnts = np.empty((n_valid, RT, 2), np.int64)
    vals = np.empty((n_valid, RT, 2), np.uint8)
    cnts[:, :, 0] = nI_d.T
    cnts[:, :, 1] = (cl_d.T != 0)
    vals[:, :, 0] = orc_OP_I
    vals[:, :, 1] = cl_d.T.astype(np.uint8)
    flat_cnt = cnts.reshape(-1)
    flat_val = vals.reshape(-1)
    stream = np.repeat(flat_val, flat_cnt)
    per_lane = cnts.reshape(n_valid, -1).sum(axis=1)
    ops = np.zeros((n_valid, L), np.uint8)
    if stream.size:
        off = np.concatenate(([0], np.cumsum(per_lane)))
        lane_of = np.repeat(np.arange(n_valid), per_lane)
        pos = np.arange(stream.size) - off[lane_of]
        keep = pos < L
        ops[lane_of[keep], pos[keep]] = stream[keep]
    return ops, per_lane.astype(np.int32)




@functools.partial(
    jax.jit,
    static_argnames=("params_static", "with_trace", "all_start_end",
                     "interpret"))
def _dp_call(qcodes, rcodes, qlens, rlens, start_end, params_static,
             with_trace, all_start_end, interpret):
    sub, go, ge, goL, geL = params_static
    B0, QT0 = qcodes.shape
    RT0 = rcodes.shape[1]
    if QT0 > 512 and all_start_end:
        # large-tile escalation geometry: full-efficiency strip kernel
        return _dp_call_strips(qcodes, rcodes, qlens, rlens, params_static,
                               with_trace, interpret)
    B = _round_up(B0, LANES)
    QT = _round_up(QT0, 32)
    pcol = _pick_pcol(QT)
    # multiple of 8 also keeps the traceback sweep's blocking valid
    RT = _round_up(RT0, max(8, pcol))
    if B != B0:
        qcodes = jnp.pad(qcodes, ((0, B - B0), (0, 0)))
        rcodes = jnp.pad(rcodes, ((0, B - B0), (0, 0)))
        qlens = jnp.pad(qlens, (0, B - B0), constant_values=1)
        rlens = jnp.pad(rlens, (0, B - B0), constant_values=1)
        start_end = jnp.pad(start_end, (0, B - B0))
    if QT != QT0:
        qcodes = jnp.pad(qcodes, ((0, 0), (0, QT - QT0)))
    if RT != RT0:
        rcodes = jnp.pad(rcodes, ((0, 0), (0, RT - RT0)))

    qT = qcodes.T                                        # (QT, B)
    rT = rcodes.T                                        # (RT, B)
    qlen2 = qlens.astype(jnp.int32)[None, :]
    rlen2 = rlens.astype(jnp.int32)[None, :]
    se2 = start_end.astype(jnp.int32)[None, :]
    n_groups = RT // pcol

    generic = not (go <= ge and goL <= geL)
    if generic:
        wf = wfl = QT       # windowing is only proven in the prefix domain
    else:
        wf, wfl = _orc.gap_scan_windows(go, ge, goL, geL, QT)
    kern = functools.partial(
        _dp_kernel, QT=QT, n_groups=n_groups, pcol=pcol, sub=sub, go=go,
        ge=ge, goL=goL, geL=geL, wf=wf, wfl=wfl,
        all_start_end=all_start_end, with_trace=with_trace,
        generic=generic)

    row_spec = pl.BlockSpec((1, LANES), lambda b, r: (0, b),
                            memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((1, B), jnp.int32),   # score
        jax.ShapeDtypeStruct((1, B), jnp.int32),   # qpos
        jax.ShapeDtypeStruct((1, B), jnp.int32),   # rpos
        jax.ShapeDtypeStruct((RT, QT, B), jnp.uint8),
    ]
    out_specs = [row_spec, row_spec, row_spec,
                 pl.BlockSpec((pcol, QT, LANES), lambda b, r: (r, 0, b),
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
        grid=(B // LANES, n_groups),
        in_specs=[
            pl.BlockSpec((QT, LANES), lambda b, r: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(8, pcol), LANES),
                         lambda b, r: (r * pcol // max(8, pcol), b),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
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
    """Scoring as static Python ints (baked into the kernel).  Both gap
    domains are supported: prefix scorings (open <= extend) use the
    windowed prefix scans, anything else the generic closed-form path
    (see the `generic` branch in _dp_kernel)."""
    sub = tuple(tuple(int(v) for v in row) for row in np.asarray(params.sub))
    return (sub, int(params.gap_open), int(params.gap_extend),
            int(params.long_gap_open), int(params.long_gap_extend))


def batch_align(qcodes, rcodes, qlens, rlens, start_end, params,
                with_trace=True, all_start_end=False, interpret=False):
    """Drop-in for gact.batch_align, trace returned in (RT, QT, B) layout
    (walk with _tb_call, or transpose for gact.batch_traceback's
    (RT, B, QT) layout)."""
    return _dp_call(qcodes, rcodes, qlens, rlens, start_end,
                    _static_params(params), with_trace, all_start_end,
                    interpret)


def align_and_traceback_device(qcodes, rcodes, qlens, rlens, start_end,
                               params, max_tb_steps, all_start_end=False,
                               interpret=False, safe=False):
    """Fully on-device DP + sweep traceback; jittable.  Returns score/pos
    plus the raw per-column traceback records (expand with
    _expand_records) and the fast-kernel spill flags (always 0 from the
    safe kernel)."""
    res = batch_align(qcodes, rcodes, qlens, rlens, start_end, params,
                      with_trace=True, all_start_end=all_start_end,
                      interpret=interpret)
    rec, qsteps, rsteps, spill = _tb_call(
        res["trace"],
        jnp.where(start_end, qlens - 1, res["query_max_pos"]),
        jnp.where(start_end, rlens - 1, res["ref_max_pos"]),
        max_tb_steps, interpret, safe=safe)
    return ({k: v for k, v in res.items() if k != "trace"}
            | {"rec": rec, "q_steps_all": qsteps, "r_steps_all": rsteps,
               "spill": spill})


def align_and_traceback(qcodes, rcodes, qlens, rlens, start_end, params,
                        max_tb_steps, all_start_end=False, interpret=False):
    """One dispatch DP + sweep traceback; ops expanded on the host
    (np.repeat over the run-length records — no per-op Python loop).
    Re-runs the safe while-based sweep when the fast kernel spills (a
    multi-run column — exact gap-lane ties only)."""
    B0 = qcodes.shape[0]
    res = batch_align(qcodes, rcodes, qlens, rlens, start_end, params,
                      with_trace=True, all_start_end=all_start_end,
                      interpret=interpret)
    tb_q = jnp.where(start_end, qlens - 1, res["query_max_pos"])
    tb_r = jnp.where(start_end, rlens - 1, res["ref_max_pos"])
    rec, qsteps, rsteps, spill = _tb_call(res["trace"], tb_q, tb_r,
                                          max_tb_steps, interpret)
    spill_h = np.asarray(spill)
    if bool(np.any(spill_h)):
        # per-lane recovery: rerun ONLY the spilled lanes (gathered into a
        # 128-multiple batch; padding lanes get start -1 = inactive)
        # through the while-based safe sweep, instead of paying a
        # whole-batch rerun for one tie-dense lane
        idx = np.flatnonzero(spill_h)
        bs = max(LANES, _round_up(len(idx), LANES))
        idx_pad = np.zeros(bs, np.int64)
        idx_pad[:len(idx)] = idx
        tr_sub = jnp.take(res["trace"], jnp.asarray(idx_pad), axis=2)
        sq_sub = np.full(bs, -1, np.int32)
        sq_sub[:len(idx)] = np.asarray(tb_q)[idx]
        sr_sub = np.full(bs, -1, np.int32)
        sr_sub[:len(idx)] = np.asarray(tb_r)[idx]
        rec_s, qs_s, rs_s, _ = _tb_call(
            tr_sub, jnp.asarray(sq_sub), jnp.asarray(sr_sub),
            max_tb_steps, interpret, safe=True)
        rec = np.array(rec)
        rec[:, idx] = np.asarray(rec_s)[:, :len(idx)]
        qsteps = np.array(qsteps)
        qsteps[idx] = np.asarray(qs_s)[:len(idx)]
        rsteps = np.array(rsteps)
        rsteps[idx] = np.asarray(rs_s)[:len(idx)]
    out = {k: v for k, v in res.items() if k != "trace"}
    rec = np.asarray(rec)
    L = min(qcodes.shape[1] + rec.shape[0], 2 * max_tb_steps)
    ops, n_ops = _expand_records(rec, B0, L)
    return out | {"ops": ops, "n_ops": n_ops,
                  "q_steps": np.asarray(qsteps)[:B0],
                  "r_steps": np.asarray(rsteps)[:B0]}
