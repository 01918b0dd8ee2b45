"""Batched GACT tile alignment on device (JAX/XLA).

Semantics match ``darwin_tpu.ops.oracle.clean_align`` /
``align_with_traceback`` — the specification distilled from the reference's
DualAlignSIMD kernel (software/Processor.cpp:164-566); see oracle.py for the
recurrences and tie-break rules.

TPU-first design (vs. the reference's per-tile function calls batched two at
a time, software/params.cfg:39):

* Tiles are batched *thousands per dispatch*; the batch is the leading axis
  of every array and the natural pjit sharding axis.
* The DP runs as one ``lax.scan`` over reference columns.  The within-column
  short/long-gap coupling (F, F_L, H) is a max-plus *affine* recurrence with
  a constant 2x2 matrix, solved with ``lax.associative_scan`` — log-depth,
  fully vectorized over (batch, query) instead of the reference's lazy-F
  iteration (Processor.cpp:382-497).
* Per-cell trace words (13 bits, layout of Processor.h:17-34) are emitted to
  HBM; traceback runs as a second, batch-vectorized ``lax.while_loop`` that
  chases pointers for all tiles in parallel (the reference walks one tile at
  a time on the host, Processor.cpp:585-716).

All tiles in a dispatch share a static (QT, RT) shape; per-tile actual sizes
are dynamic and masked.  Padded cells never feed valid cells (DP flows
forward in q and r), so only max-tracking needs masking.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from darwin_tpu.ops import oracle as orc

NEG = np.int32(-(1 << 28))


class GactParams(NamedTuple):
    sub: jax.Array          # (5,5) int32
    gap_open: jax.Array     # scalar int32
    gap_extend: jax.Array
    long_gap_open: jax.Array
    long_gap_extend: jax.Array


def make_params(cfg) -> GactParams:
    return GactParams(
        sub=jnp.asarray(cfg.sub_matrix_5x5, jnp.int32),
        gap_open=jnp.int32(cfg.gap_open),
        gap_extend=jnp.int32(cfg.gap_extend),
        long_gap_open=jnp.int32(cfg.long_gap_open),
        long_gap_extend=jnp.int32(cfg.long_gap_extend),
    )


def _maxplus_combine(a, b):
    """Compose max-plus affine elements: b after a.

    Element = (m00, m01, m10, m11, c0, c1) for v -> M (x) v (+) c.
    """
    a00, a01, a10, a11, ac0, ac1 = a
    b00, b01, b10, b11, bc0, bc1 = b
    m00 = jnp.maximum(b00 + a00, b01 + a10)
    m01 = jnp.maximum(b00 + a01, b01 + a11)
    m10 = jnp.maximum(b10 + a00, b11 + a10)
    m11 = jnp.maximum(b10 + a01, b11 + a11)
    c0 = jnp.maximum(jnp.maximum(b00 + ac0, b01 + ac1), bc0)
    c1 = jnp.maximum(jnp.maximum(b10 + ac0, b11 + ac1), bc1)
    return (m00, m01, m10, m11, c0, c1)


def _column_gap_scan(hp, go, ge, goL, geL):
    """Solve the within-column coupled recurrence for (F, F_L) given
    Hp = max(dag, E, E_L):

        F(q)   = max(H(q-1)+go,  F(q-1)+ge)
        F_L(q) = max(H(q-1)+goL, F_L(q-1)+geL)
        H(q)   = max(Hp(q), F(q), F_L(q))

    Substituting H(q-1) yields  v(q) = A (x) v(q-1) (+) b(q)  with
        A = [[max(go,ge), go], [goL, max(goL,geL)]]
        b(q) = (HpShift(q)+go, HpShift(q)+goL),  HpShift(q) = Hp(q-1), Hp(-1)=0.

    hp: (B, Q) int32.  Returns (F, F_L) each (B, Q).
    """
    B, Q = hp.shape
    hps = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), hp[:, :-1]], axis=1)
    a00 = jnp.full((B, Q), jnp.maximum(go, ge), jnp.int32)
    a01 = jnp.full((B, Q), go, jnp.int32)
    a10 = jnp.full((B, Q), goL, jnp.int32)
    a11 = jnp.full((B, Q), jnp.maximum(goL, geL), jnp.int32)
    c0 = hps + go
    c1 = hps + goL
    res = jax.lax.associative_scan(
        _maxplus_combine, (a00, a01, a10, a11, c0, c1), axis=1)
    return res[4], res[5]


def _shift_q(x, fill):
    """x[..., q] <- x[..., q-1], x[..., 0] <- fill."""
    pad = jnp.full(x.shape[:-1] + (1,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-1]], axis=-1)


@functools.partial(jax.jit, static_argnames=("with_trace",))
def batch_align(qcodes, rcodes, qlens, rlens, start_end, params,
                with_trace=True):
    """Align a batch of tiles.

    qcodes: (B, QT) uint8 5-letter codes; rcodes: (B, RT).
    qlens/rlens: (B,) int32 actual sizes (1..QT / 1..RT).
    start_end: (B,) bool — align_fields bit 0 (score at the end cell) vs
    max-cell mode.

    Returns dict with score, query_max_pos, ref_max_pos (all (B,) int32) and,
    if with_trace, trace of shape (RT, B, QT) int16 (trace[r, b, q]).
    """
    B, QT = qcodes.shape
    RT = rcodes.shape[1]
    sub = params.sub
    go, ge = params.gap_open, params.gap_extend
    goL, geL = params.long_gap_open, params.long_gap_extend

    q_idx = jnp.arange(QT, dtype=jnp.int32)[None, :]           # (1, QT)
    valid_q = q_idx < qlens[:, None]                           # (B, QT)
    sub_flat = sub.reshape(-1)
    qc = qcodes.astype(jnp.int32)

    def step(carry, r):
        (h_prev, e, e_l, pending_ebits, best, best_q, best_r, h_end) = carry

        rchar = jax.lax.dynamic_index_in_dim(
            rcodes, r, axis=1, keepdims=False).astype(jnp.int32)  # (B,)
        prof = jnp.take(sub_flat, qc * 5 + rchar[:, None])        # (B, QT)

        dag = jnp.maximum(_shift_q(h_prev, 0) + prof, 0)
        hp = jnp.maximum(jnp.maximum(dag, e), e_l)
        f, f_l = _column_gap_scan(hp, go, ge, goL, geL)
        h = jnp.maximum(hp, jnp.maximum(f, f_l))

        # ---- trace word (see oracle.clean_align) ----
        is_d = h == dag
        is_f = h == f
        is_fl = h == f_l
        is_el = h == e_l
        t = jnp.full((B, QT), orc.T_DEL, jnp.int32)
        t = jnp.where(is_d, jnp.where(h == 0, orc.T_ZERO, orc.T_DIAG), t)
        t = jnp.where(is_fl, orc.T_INS_L, t)
        t = jnp.where(is_el, orc.T_DEL_L, t)
        t = jnp.where(~is_d & ~is_f & is_fl, orc.T_INS_L, t)
        t = jnp.where(~is_d & is_f, orc.T_INS, t)

        h_up = _shift_q(h, 0)
        f_up = _shift_q(f, NEG)
        fl_up = _shift_q(f_l, NEG)
        fbits = jnp.where(h_up + go > f_up + ge, orc.F_DIAG_INS, orc.F_INS)
        flbits = jnp.where(h_up + goL > fl_up + geL,
                           orc.FL_DIAG_INS, orc.FL_INS)
        word = (t + fbits + flbits + pending_ebits).astype(jnp.int16)

        next_ebits = (
            jnp.where(h + go > e + ge, orc.E_DIAG_DEL, orc.E_DEL)
            + jnp.where(h + goL > e_l + geL, orc.EL_DIAG_DEL, orc.EL_DEL)
        )

        e_new = jnp.maximum(h + go, e + ge)
        e_l_new = jnp.maximum(h + goL, e_l + geL)

        # ---- max tracking (earliest column with the strict global max,
        # then smallest q in that column; Processor.cpp:502-541) ----
        r_valid = r < rlens
        hm = jnp.where(valid_q & r_valid[:, None], h, -1)
        colmax = jnp.max(hm, axis=1)
        improved = colmax > best
        colargq = jnp.argmax(hm == colmax[:, None], axis=1).astype(jnp.int32)
        best = jnp.where(improved, colmax, best)
        best_q = jnp.where(improved, colargq, best_q)
        best_r = jnp.where(improved, r, best_r)

        # ---- start_end capture: H(qlen-1, rlen-1) ----
        at_end = r == (rlens - 1)
        h_at_qend = jnp.take_along_axis(
            h, (qlens[:, None] - 1), axis=1)[:, 0]
        h_end = jnp.where(at_end, h_at_qend, h_end)

        carry = (h, e_new, e_l_new, next_ebits, best, best_q, best_r, h_end)
        return carry, (word if with_trace else None)

    init_ebits = jnp.full((B, QT),
                          orc.E_DIAG_DEL + orc.EL_DIAG_DEL, jnp.int32)
    carry0 = (
        jnp.zeros((B, QT), jnp.int32),            # H_prev
        jnp.full((B, QT), go, jnp.int32),         # E at column 0
        jnp.full((B, QT), goL, jnp.int32),        # E_L at column 0
        init_ebits,
        jnp.zeros((B,), jnp.int32),               # best score
        jnp.zeros((B,), jnp.int32),               # best q
        jnp.zeros((B,), jnp.int32),               # best r
        jnp.zeros((B,), jnp.int32),               # H at end cell
    )
    carry, trace = jax.lax.scan(step, carry0,
                                jnp.arange(RT, dtype=jnp.int32))
    (_, _, _, _, best, best_q, best_r, h_end) = carry

    score = jnp.where(start_end, h_end, best)
    q_pos = jnp.where(start_end, qlens - 1, best_q)
    r_pos = jnp.where(start_end, rlens - 1, best_r)
    out = {"score": score, "query_max_pos": q_pos, "ref_max_pos": r_pos}
    if with_trace:
        out["trace"] = trace  # (RT, B, QT) int16
    return out


# Traceback walker states
_ST_DIAG = 0
_ST_DEL = 1
_ST_INS = 2
_ST_DEL_L = 3
_ST_INS_L = 4
_ST_DONE = 5


@functools.partial(jax.jit, static_argnames=("max_tb_steps",))
def batch_traceback(trace, start_q, start_r, max_tb_steps):
    """Batched traceback over (RT, B, QT) trace words.

    Walks DualAlignSIMDTraceback's state machine (Processor.cpp:585-716) for
    all tiles in lock-step.  Returns:
      ops      : (B, 2*max_tb_steps) uint8, op codes in traceback order
                 (orc.OP_M/I/D), zero-padded
      n_ops    : (B,) int32 total ops (total_TB_pointers)
      q_steps  : (B,) int32 query bases consumed (query_offset)
      r_steps  : (B,) int32 ref bases consumed (ref_offset)
    """
    RT, B, QT = trace.shape
    tflat = trace.reshape(-1)
    max_ops = 2 * max_tb_steps

    def cond(state):
        _, _, _, _, _, st, _, t = state
        return jnp.logical_and(t < 2 * max_ops + 4,
                               jnp.any(st != _ST_DONE))

    def body(state):
        i, j, qs, rs, n, st, ops, t = state

        # steps cap checked at loop top (Processor.cpp:616-618)
        capped = (qs == max_tb_steps) | (rs == max_tb_steps)
        oob = (i < 0) | (j < 0)
        st = jnp.where((st != _ST_DONE) & (capped | oob), _ST_DONE, st)

        idx = (jnp.clip(j, 0, RT - 1) * B * QT
               + jnp.arange(B, dtype=jnp.int32) * QT
               + jnp.clip(i, 0, QT - 1))
        w = jnp.take(tflat, idx).astype(jnp.int32)

        is_diag = st == _ST_DIAG
        # DIAG state dispatch (exclusive T field, bits 0-4)
        tfield = w & 31
        d_move = is_diag & ((tfield & orc.T_DIAG) != 0)
        d_to_del = is_diag & (tfield == orc.T_DEL)
        d_to_ins = is_diag & (tfield == orc.T_INS)
        d_to_del_l = is_diag & (tfield == orc.T_DEL_L)
        d_to_ins_l = is_diag & (tfield == orc.T_INS_L)
        d_stop = is_diag & (tfield == orc.T_ZERO)

        in_del = st == _ST_DEL
        in_ins = st == _ST_INS
        in_del_l = st == _ST_DEL_L
        in_ins_l = st == _ST_INS_L

        emit_m = d_move
        emit_d = in_del | in_del_l
        emit_i = in_ins | in_ins_l
        op = jnp.where(emit_m, orc.OP_M,
                       jnp.where(emit_d, orc.OP_D,
                                 jnp.where(emit_i, orc.OP_I, orc.OP_NONE)))
        emits = op != orc.OP_NONE

        ops = ops.at[jnp.arange(B), jnp.clip(n, 0, max_ops - 1)].set(
            jnp.where(emits, op, ops[jnp.arange(B),
                                     jnp.clip(n, 0, max_ops - 1)]
                      ).astype(jnp.uint8))
        n = jnp.where(emits, n + 1, n)

        di = jnp.where(emit_m | emit_i, 1, 0)
        dj = jnp.where(emit_m | emit_d, 1, 0)
        qs = qs + jnp.where(emits, di, 0)
        rs = rs + jnp.where(emits, dj, 0)
        i = i - jnp.where(emits, di, 0)
        j = j - jnp.where(emits, dj, 0)

        # next state
        nst = st
        nst = jnp.where(d_to_del, _ST_DEL, nst)
        nst = jnp.where(d_to_ins, _ST_INS, nst)
        nst = jnp.where(d_to_del_l, _ST_DEL_L, nst)
        nst = jnp.where(d_to_ins_l, _ST_INS_L, nst)
        nst = jnp.where(d_stop, _ST_DONE, nst)
        nst = jnp.where(in_del,
                        jnp.where((w & orc.E_DIAG_DEL) != 0, _ST_DIAG,
                                  _ST_DEL), nst)
        nst = jnp.where(in_ins,
                        jnp.where((w & orc.F_DIAG_INS) != 0, _ST_DIAG,
                                  _ST_INS), nst)
        nst = jnp.where(in_del_l,
                        jnp.where((w & orc.EL_DIAG_DEL) != 0, _ST_DIAG,
                                  _ST_DEL_L), nst)
        nst = jnp.where(in_ins_l,
                        jnp.where((w & orc.FL_DIAG_INS) != 0, _ST_DIAG,
                                  _ST_INS_L), nst)
        st = jnp.where(st == _ST_DONE, _ST_DONE, nst)
        return (i, j, qs, rs, n, st, ops, t + 1)

    zeros = jnp.zeros((B,), jnp.int32)
    state0 = (start_q.astype(jnp.int32), start_r.astype(jnp.int32),
              zeros, zeros, zeros,
              jnp.full((B,), _ST_DIAG, jnp.int32),
              jnp.zeros((B, max_ops), jnp.uint8),
              jnp.int32(0))
    i, j, qs, rs, n, st, ops, _ = jax.lax.while_loop(cond, body, state0)
    return {"ops": ops, "n_ops": n, "q_steps": qs, "r_steps": rs}


def align_and_traceback(qcodes, rcodes, qlens, rlens, start_end, params,
                        max_tb_steps):
    """One-dispatch DP + traceback; only compact results leave the device.

    Traceback starts at (qlen-1, rlen-1) for start_end tiles and at the max
    cell otherwise (Processor.cpp:593-598).
    """
    res = batch_align(qcodes, rcodes, qlens, rlens, start_end, params,
                      with_trace=True)
    tb = batch_traceback(res["trace"],
                         jnp.where(start_end, qlens - 1, res["query_max_pos"]),
                         jnp.where(start_end, rlens - 1, res["ref_max_pos"]),
                         max_tb_steps)
    return {k: v for k, v in res.items() if k != "trace"} | tb
