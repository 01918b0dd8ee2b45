"""NumPy oracles for the GACT tile kernel.

The reference binary wires the *striped SIMD* kernel (DualAlignSIMD,
software/Processor.cpp:164-566, bound at software/Processor.cpp:1069), a
parasail-style 16-lane striped Smith-Waterman with two-piece affine gaps and
a full per-cell trace matrix.  Two oracles live here:

``clean_align``
    The specification our device kernels implement: a full-matrix DP over the
    *converged* cell values with the trace tie-break rules derived from the
    striped kernel's blend chains (see trace-priority notes below).  On all
    non-degenerate inputs this matches the striped kernel; it can differ only
    on exact multi-way score ties interacting with the striped kernel's
    lazy-F pass (Processor.cpp:409-497), whose visitation order depends on
    the stripe geometry.

``striped_align``
    A faithful lane-by-lane emulation of DualAlignSIMD (including stripe
    layout, the lazy-F loop and its early exit) used in tests to adjudicate
    the clean spec.

Recurrences (converged values), cell (q, r), q over query, r over ref:
    dag(q,r) = max(H(q-1,r-1) + sub(query[q], ref[r]), 0)       # :298-299
    E(q,r)   = max(H(q,r-1) + go,  E(q,r-1) + ge)   E(q,0)=go   # :336-341,230
    E_L(q,r) = max(H(q,r-1) + goL, E_L(q,r-1) + geL) E_L(q,0)=goL
    F(q,r)   = max(H(q-1,r) + go,  F(q-1,r) + ge)   F(-1,r)=-inf, H(-1,r)=0
    F_L(q,r) = max(H(q-1,r) + goL, F_L(q-1,r) + geL)
    H(q,r)   = max(dag, E, F, E_L, F_L)

Correctness caveat inherited from the striped kernel: E/E_L for the next
column are stored from the *pre-lazy* H (Processor.cpp:332-341 vs the lazy
loop which only refreshes Ea, :452-475).  With scorings satisfying
``gap_open <= min(sub) - gap_extend`` (the defaults: -4 <= -6-(-2)) the
missing candidates are dominated or tied, so converged-value DP produces
identical scores; only exact-tie traces can differ.

Max-cell mode (align_fields bit0 == 0): score = global max of H; end_ref =
first column where the global max first appears (Processor.cpp:502-509);
end_query = smallest q with H(q,end_ref) == score (:528-541).  start_end
mode: score = H(Q-1,R-1), ends = (Q-1, R-1) (:514-517,544-547).
"""

from __future__ import annotations

import numpy as np

NEG_INF = -16384  # INT16_MIN/2, Processor.cpp:13

# Trace-word bits (Processor.h:17-34)
T_ZERO = 0
T_DEL = 1
T_INS = 2
T_DEL_L = 4
T_INS_L = 8
T_DIAG = 16
E_DIAG_DEL = 32
E_DEL = 64
F_DIAG_INS = 128
F_INS = 256
EL_DIAG_DEL = 512
EL_DEL = 1024
FL_DIAG_INS = 2048
FL_INS = 4096

# 2-bit traceback op codes (enum states Z,I,D,M, Processor.h:14; packed via
# state % 4 at Processor.cpp:570,998)
OP_NONE = 0
OP_I = 1  # consumes one query base (gap in reference)
OP_D = 2  # consumes one reference base (gap in query)
OP_M = 3  # consumes one of each


def gap_scan_windows(go, ge, goL, geL, q):
    """(W_f, W_fl): per-lane lookback for the within-column gap prefix
    maxima, as powers of two (q-clamped; q itself means a full scan).

    A lane whose extension is strictly costlier than the other lane's is
    dominated for gap runs longer than the crossover
        L* = 1 + floor((open_self - open_other) / (ext_other - ext_self))
    (ties INCLUDED at L*), so its prefix max only needs to look back
    W = 2^ceil(log2(L*)) >= L* rows.  Every trace bit any traceback can
    read is unchanged: a cell where the windowed lane attains (or ties) H
    has an optimal run length <= L* (a longer one is strictly beaten by
    the other, un-windowed lane there, contradicting fl <= h), and every
    cell of the walked run chain — including the open-bit comparisons —
    involves only runs <= L*, all inside the window.  Only the
    *never-read* open bits at cells whose notional best run exceeds W can
    differ from the full scan.  Valid only in the prefix-gaps domain
    (open <= extend for both lanes); callers gate on that.
    """
    go, ge, goL, geL = int(go), int(ge), int(goL), int(geL)

    def pow2ceil(x):
        return 1 << max(1, (x - 1).bit_length())

    wf = wfl = q
    if geL > ge:          # short extension costlier: short lane windowed
        lstar = 1 + max(0, (go - goL)) // (geL - ge)
        wf = min(q, pow2ceil(max(2, lstar)))
    elif ge > geL:        # long extension costlier: long lane windowed
        lstar = 1 + max(0, (goL - go)) // (ge - geL)
        wfl = min(q, pow2ceil(max(2, lstar)))
    return wf, wfl


def _np_windowed_max(a, w):
    """Trailing-window (width w, power of two) inclusive max along axis 0
    via log-shift steps; w >= len(a) = full prefix max."""
    s = 1
    while s < min(w, len(a)):
        sh = np.concatenate([np.full(s, NEG_INF, a.dtype), a[:-s]])
        a = np.maximum(a, sh)
        s *= 2
    return a


def clean_align(query, ref, sub, gap_open, gap_extend,
                long_gap_open, long_gap_extend, start_end):
    """Full-matrix DP with converged values.

    query, ref: int arrays of 5-letter codes (0..4).
    sub: 5x5 substitution matrix.
    Returns (score, end_query, end_ref, trace) where trace is an
    (Q, R) int16 matrix of reference-layout trace words.
    """
    query = np.asarray(query)
    ref = np.asarray(ref)
    Q, R = len(query), len(ref)
    sub = np.asarray(sub, dtype=np.int32)
    go, ge, goL, geL = gap_open, gap_extend, long_gap_open, long_gap_extend
    if Q == 0 or R == 0:
        return 0, 0, 0, np.zeros((Q, R), np.int16)

    trace = np.zeros((Q, R), np.int16)

    H_prev = np.zeros(Q, np.int32)
    E = np.full(Q, go, np.int32)      # E used in column 0 (pvE init, :230)
    E_L = np.full(Q, goL, np.int32)

    # prefix-gaps fast path (same windowed prefix-max formulation as the
    # device kernels, gact._column_gaps_prefix / gap_scan_windows — keeps
    # the three implementations' trace words bit-identical)
    prefix_ok = go <= ge and goL <= geL
    wf, wfl = gap_scan_windows(go, ge, goL, geL, Q)
    q_idx = np.arange(Q, dtype=np.int32)

    best = 0
    end_ref = 0
    end_query = 0
    have_best = False

    # Per-column sub profile
    for r in range(R):
        prof = sub[query, ref[r]]
        dag = np.maximum(np.concatenate(([0], H_prev[:-1])) + prof, 0)
        Hp = np.maximum(np.maximum(dag, E), E_L)
        if prefix_ok:
            # F(q) = go + ge*(q-1) + max_{j=-1..q-1}(Hp(j) - ge*j), the
            # dominated lane windowed (values equal the coupled recurrence
            # wherever any traceback can read them; see gap_scan_windows)
            def lane(open_, ext, w):
                a = np.concatenate(
                    ([ext], (Hp[:Q - 1] - ext * q_idx[:Q - 1])
                     .astype(np.int32)))
                return open_ + ext * (q_idx - 1) + _np_windowed_max(a, w)
            F = lane(go, ge, wf)
            F_L = lane(goL, geL, wfl)
            H = np.maximum(Hp, np.maximum(F, F_L))
        else:
            # generic scoring: coupled within-column F / F_L / H scan
            H = np.empty(Q, np.int32)
            F = np.empty(Q, np.int32)
            F_L = np.empty(Q, np.int32)
            f = NEG_INF
            fl = NEG_INF
            h_prev_row = 0  # H(-1, r)
            for q in range(Q):
                f = max(h_prev_row + go, f + ge)
                fl = max(h_prev_row + goL, fl + geL)
                h = max(Hp[q], f, fl)
                F[q] = f
                F_L[q] = fl
                H[q] = h
                h_prev_row = h

        # ---- trace words ----
        # T field: effective priority of the striped kernel's first-pass
        # blend chain (Processor.cpp:314-325) + full-lazy overrides
        # (:424-431); see module docstring.
        is_d = H == dag
        is_f = H == F
        is_fl = H == F_L
        is_el = H == E_L
        t = np.full(Q, T_DEL, np.int16)
        t = np.where(is_d, np.where(H == 0, T_ZERO, T_DIAG), t)
        t = np.where(is_fl, T_INS_L, t)
        t = np.where(is_el, T_DEL_L, t)
        t = np.where(~is_d & ~is_f & is_fl, T_INS_L, t)
        t = np.where(~is_d & is_f, T_INS, t)

        # F-source bits for this column's cells (cond_F strict >, :369-372;
        # boundary via lazy slot-0 insert of gap_open vs NEG_INF, :389-397)
        h_up = np.concatenate(([0], H[:-1]))
        f_up = np.concatenate(([NEG_INF], F[:-1]))
        fl_up = np.concatenate(([NEG_INF], F_L[:-1]))
        fbits = np.where(h_up + go > f_up + ge, F_DIAG_INS, F_INS)
        flbits = np.where(h_up + goL > fl_up + geL, FL_DIAG_INS, FL_INS)

        # E-source bits of THIS column: for column 0 they come from the d=0
        # init (DIAG_DEL + DIAG_DEL_L, :237-239); for r>=1 they describe
        # E(q,r)'s source and were stored at column j+1 while processing
        # column j=r-1 (cond_E = vEF_opn > vEa_ext, :352-359), i.e.
        # E(q,r) open iff H(q,r-1)+go > E(q,r-1)+ge with converged H.
        if r == 0:
            ebits = np.full(Q, E_DIAG_DEL + EL_DIAG_DEL, np.int16)
        else:
            ebits = _pending_ebits  # noqa: F821  (set on previous iteration)

        trace[:, r] = (t + fbits.astype(np.int16) + flbits.astype(np.int16)
                       + ebits)

        if r + 1 < R:
            _pending_ebits = (
                np.where(H + go > E + ge, E_DIAG_DEL, E_DEL)
                + np.where(H + goL > E_L + geL, EL_DIAG_DEL, EL_DEL)
            ).astype(np.int16)

        # ---- update E for next column ----
        E = np.maximum(H + go, E + ge)
        E_L = np.maximum(H + goL, E_L + geL)

        # ---- max tracking (:502-509) ----
        colmax = int(H.max())
        if colmax > best:
            best = colmax
            end_ref = r
            end_query = int(np.argmax(H == colmax))
            have_best = True

        H_prev = H

    if start_end:
        score = int(H_prev[Q - 1])
        return score, Q - 1, R - 1, trace
    if not have_best:
        # Degenerate all-zero case; the reference's buffer dance leaves
        # end_query derived from stale data (Processor.cpp:520-541).  Only
        # reachable from max-mode tiles which are then rejected by the
        # score threshold, so positions are irrelevant; return zeros.
        return 0, 0, 0, trace
    return best, end_query, end_ref, trace


def traceback(trace, end_query, end_ref, max_tb_steps):
    """Walk a trace matrix exactly like DualAlignSIMDTraceback
    (Processor.cpp:585-716).

    Returns (ops, query_offset, ref_offset): ops is a list of 2-bit op codes
    in traceback order (first op applies at (end_query, end_ref)),
    query_offset/ref_offset are i_steps/j_steps (# of query/ref bases
    consumed).
    """
    i = int(end_query)
    j = int(end_ref)
    i_steps = 0
    j_steps = 0
    where = T_DIAG
    ops = []
    while i >= 0 and j >= 0:
        if i_steps == max_tb_steps or j_steps == max_tb_steps:
            break
        w = int(trace[i, j])
        if where == T_DIAG:
            if w & T_DIAG:
                ops.append(OP_M)
                i -= 1
                j -= 1
                i_steps += 1
                j_steps += 1
            elif w & T_DEL:
                where = T_DEL
            elif w & T_INS:
                where = T_INS
            elif w & T_DEL_L:
                where = T_DEL_L
            elif w & T_INS_L:
                where = T_INS_L
            else:
                break
        elif where == T_DEL:
            ops.append(OP_D)
            j -= 1
            j_steps += 1
            where = T_DIAG if (w & E_DIAG_DEL) else T_DEL
            assert (w & (E_DIAG_DEL | E_DEL)), "bad E trace"
        elif where == T_INS:
            ops.append(OP_I)
            i -= 1
            i_steps += 1
            where = T_DIAG if (w & F_DIAG_INS) else T_INS
            assert (w & (F_DIAG_INS | F_INS)), "bad F trace"
        elif where == T_DEL_L:
            ops.append(OP_D)
            j -= 1
            j_steps += 1
            where = T_DIAG if (w & EL_DIAG_DEL) else T_DEL_L
        elif where == T_INS_L:
            ops.append(OP_I)
            i -= 1
            i_steps += 1
            where = T_DIAG if (w & FL_DIAG_INS) else T_INS_L
        else:
            break
    return ops, i_steps, j_steps


def align_with_traceback(query, ref, sub, gap_open, gap_extend,
                         long_gap_open, long_gap_extend,
                         start_end, max_tb_steps, do_traceback=True):
    """Full kernel semantics of one BatchAlignmentSIMD request
    (Processor.cpp:718-762): returns a dict mirroring AlignmentResult."""
    score, eq, er, trace = clean_align(
        query, ref, sub, gap_open, gap_extend, long_gap_open,
        long_gap_extend, start_end)
    out = {
        "score": score,
        "query_max_pos": eq,
        "ref_max_pos": er,
        "ops": [],
        "query_offset": 0,
        "ref_offset": 0,
    }
    if do_traceback:
        tb_q, tb_r = (len(query) - 1, len(ref) - 1) if start_end else (eq, er)
        ops, i_steps, j_steps = traceback(trace, tb_q, tb_r, max_tb_steps)
        out["ops"] = ops
        out["query_offset"] = i_steps
        out["ref_offset"] = j_steps
    return out


# ---------------------------------------------------------------------------
# Faithful striped emulation (test adjudicator)
# ---------------------------------------------------------------------------

def _vshift(v, fill=0):
    """_mm256_slli_si256_rpl(v, 2): lane i <- lane i-1, lane 0 <- fill
    (Processor.cpp:5, emulated 256-bit byte shift on 16 int16 lanes)."""
    out = np.empty_like(v)
    out[1:] = v[:-1]
    out[0] = fill
    return out


def striped_align(query, ref, sub, gap_open, gap_extend,
                  long_gap_open, long_gap_extend, start_end):
    """Lane-faithful emulation of DualAlignSIMD (Processor.cpp:164-566).

    Returns (score, end_query, end_ref, trace) with trace converted to the
    same (Q, R) cell-indexed layout as clean_align.
    """
    query = np.asarray(query)
    ref = np.asarray(ref)
    sub = np.asarray(sub, dtype=np.int32)
    Q, R = len(query), len(ref)
    go, ge, goL, geL = gap_open, gap_extend, long_gap_open, long_gap_extend
    if Q == 0 or R == 0:
        return 0, 0, 0, np.zeros((Q, R), np.int16)

    W = 16
    segLen = (Q + W - 1) // W

    def v(x):
        return np.full(W, x, np.int32)

    # vProfile[c][i][s] (CreateVProfile, :87-115)
    prof = np.zeros((5, segLen, W), np.int32)
    for c in range(5):
        for i in range(segLen):
            for s in range(W):
                jq = i + s * segLen
                prof[c, i, s] = 0 if jq >= Q else sub[c, query[jq]]

    pvHStore = np.zeros((segLen, W), np.int32)
    pvHLoad = np.zeros((segLen, W), np.int32)
    pvHMax = np.zeros((segLen, W), np.int32)
    pvE = np.full((segLen, W), go, np.int32)
    pvEaStore = np.full((segLen, W), go, np.int32)
    pvEaLoad = np.zeros((segLen, W), np.int32)
    pvE_L = np.full((segLen, W), goL, np.int32)
    pvE_LaStore = np.full((segLen, W), goL, np.int32)
    pvE_LaLoad = np.zeros((segLen, W), np.int32)
    pvHT = np.zeros((segLen, W), np.int32)

    trace = np.zeros((R, segLen, W), np.int32)
    trace[0, :, :] = E_DIAG_DEL + EL_DIAG_DEL  # :237-239

    vMaxH = np.zeros(W, np.int32)
    vMaxHUnit = np.zeros(W, np.int32)
    score = 0
    end_ref = 0

    for j in range(R):
        vF = v(go)     # :265 (vZero - vGapO)
        vF_L = v(goL)  # :269
        vH = _vshift(pvHStore[segLen - 1])  # :272-273

        c = ref[j]
        vP = prof[c]

        if end_ref == j - 2:
            # :279-284 SWAP3(pvHMax, pvHLoad, pvHStore)
            pvHMax, pvHLoad, pvHStore = pvHLoad, pvHStore, pvHMax
            pvEaLoad, pvEaStore = pvEaStore, pvEaLoad
            pvE_LaLoad, pvE_LaStore = pvE_LaStore, pvE_LaLoad
        else:
            pvHLoad, pvHStore = pvHStore, pvHLoad
            pvEaLoad, pvEaStore = pvEaStore, pvEaLoad
            pvE_LaLoad, pvE_LaStore = pvE_LaStore, pvE_LaLoad

        vEF_opn = v(0)
        vEF_L_opn = v(0)
        vE_ext = v(0)
        vF_ext = v(0)
        vF_L_ext = v(0)

        for i in range(segLen):
            vE = pvE[i].copy()
            vE_L = pvE_L[i].copy()

            vH_dag = np.maximum(vH + vP[i], 0)
            vH = np.maximum.reduce([vH_dag, vE, vF, vE_L, vF_L])
            pvHStore[i] = vH

            # first-pass T blend chain (:308-329)
            vTAll = trace[j, i].copy()
            cond_zero = vH == 0
            case1 = vH == vH_dag
            case2 = vH == vF
            case3 = vH == vF_L
            case4 = vH == vE_L
            vT = np.where(case1,
                          np.where(cond_zero, T_ZERO, T_DIAG),
                          np.where(case2, T_INS, T_DEL))
            vT = np.where(case3, T_INS_L, vT)
            vT = np.where(case4, T_DEL_L, vT)
            pvHT[i] = vT
            trace[j, i] = vT | vTAll

            vMaxH = np.maximum(vH, vMaxH)
            vEF_opn = vH - (-go)  # vH - vGapO, vGapO = -go
            vEF_L_opn = vH - (-goL)

            vE_ext = vE - (-ge)
            vE = np.maximum(vEF_opn, vE_ext)
            pvE[i] = vE
            vE_L_ext = vE_L - (-geL)
            vE_L = np.maximum(vEF_L_opn, vE_L_ext)
            pvE_L[i] = vE_L

            vEa = pvEaLoad[i].copy()
            vEa_ext = vEa - (-ge)
            vE_La = pvE_LaLoad[i].copy()
            vE_La_ext = vE_La - (-geL)
            vEa = np.maximum(vEF_opn, vEa_ext)
            pvEaStore[i] = vEa
            vE_La = np.maximum(vEF_L_opn, vE_La_ext)
            pvE_LaStore[i] = vE_La
            if j + 1 < R:
                vT_E = np.where(vEF_opn > vEa_ext, E_DIAG_DEL, E_DEL)
                vT_E_L = np.where(vEF_L_opn > vE_La_ext, EL_DIAG_DEL, EL_DEL)
                trace[j + 1, i] = vT_E | vT_E_L

            vF_ext = vF - (-ge)
            vF = np.maximum(vEF_opn, vF_ext)
            vF_L_ext = vF_L - (-geL)
            vF_L = np.maximum(vEF_L_opn, vF_L_ext)
            if i + 1 < segLen:
                vTAll2 = trace[j, i + 1].copy()
                vT_F = np.where(vEF_opn > vF_ext, F_DIAG_INS, F_INS)
                vT_F_L = np.where(vEF_L_opn > vF_L_ext, FL_DIAG_INS, FL_INS)
                trace[j, i + 1] = vT_F | vT_F_L | vTAll2

            vH = pvHLoad[i].copy()

        # Lazy F/F_L loop (:382-497)
        vFa_ext = vF_ext.copy()
        vFa = vF.copy()
        done = False
        for k in range(W):
            if done:
                break
            vHp = _vshift(pvHLoad[segLen - 1])
            vEF_opn = _vshift(vEF_opn, go)
            vF_ext = _vshift(vF_ext, NEG_INF)
            vF = _vshift(vF, go)
            vFa_ext = _vshift(vFa_ext, NEG_INF)
            vFa = _vshift(vFa, go)
            vEF_L_opn = _vshift(vEF_L_opn, goL)
            vF_L_ext = _vshift(vF_L_ext, NEG_INF)
            vF_L = _vshift(vF_L, goL)
            # k == 0 models ZERO-initialized vF_La/vF_La_ext.  The reference
            # seeds the short-gap lazy accumulators (vFa_ext = vF_ext,
            # vFa = vF, Processor.cpp:385-386) but never the long-gap twins
            # vF_La/vF_La_ext, whose first use is this shift — a genuine
            # uninitialized-variable bug: the affected F_L source bits of
            # stripe-0 cells vary with compiler flags (verified: -O0, -O2 and
            # -ftrivial-auto-var-init={zero,pattern} builds produce different
            # trace matrices on the same input; scores/positions agree).  The
            # ground-truth .so (tests/ref_kernel.py) is built with
            # -ftrivial-auto-var-init=zero to pin this down; lanes 1.. carry
            # the zero-init through the k=0 shift.
            vF_La_ext = (_vshift(vF_La_ext, NEG_INF) if k > 0
                         else _vshift(v(0), NEG_INF))
            vF_La = _vshift(vF_La, goL) if k > 0 else _vshift(v(0), goL)
            for i in range(segLen):
                vH = pvHStore[i].copy()
                vH = np.maximum(vH, vF)
                vH = np.maximum(vH, vF_L)
                pvHStore[i] = vH

                vHp = np.maximum(vHp + vP[i], 0)
                case1 = vH == vHp
                case2 = vH == vF
                case3 = vH == vF_L
                cond_F = (~case1) & case2
                cond_F_L = (~(case1 | case2)) & case3
                vT = pvHT[i].copy()
                vT = np.where(cond_F, T_INS, vT)
                vT = np.where(cond_F_L, T_INS_L, vT)
                pvHT[i] = vT
                vTAll = trace[j, i] & ~np.int32(T_ZERO | T_DEL | T_INS
                                                | T_DEL_L | T_INS_L | T_DIAG)
                trace[j, i] = vTAll | vT

                vMaxH = np.maximum(vH, vMaxH)

                # F-source trace rewrite (:440-451)
                vTAll = trace[j, i].copy()
                vT_F = np.where(vEF_opn > vFa_ext, F_DIAG_INS, F_INS)
                vT_F_L = np.where(vEF_L_opn > vF_La_ext, FL_DIAG_INS, FL_INS)
                vTAll = (vTAll & ~np.int32(F_DIAG_INS | F_INS)) | vT_F
                vTAll = (vTAll & ~np.int32(FL_DIAG_INS | FL_INS)) | vT_F_L
                trace[j, i] = vTAll

                vEF_opn = vH - (-go)
                vF_ext = vF - (-ge)
                vEF_L_opn = vH - (-goL)
                vF_L_ext = vF_L - (-geL)

                vEa = pvEaLoad[i].copy()
                vEa_ext = vEa - (-ge)
                vEa = np.maximum(vEF_opn, vEa_ext)
                pvEaStore[i] = vEa
                vE_La = pvE_LaLoad[i].copy()
                vE_La_ext = vE_La - (-geL)
                vE_La = np.maximum(vEF_L_opn, vE_La_ext)
                pvE_LaStore[i] = vE_La
                if j + 1 < R:
                    vT_E = np.where(vEF_opn > vEa_ext, E_DIAG_DEL, E_DEL)
                    vT_E_L = np.where(vEF_L_opn > vE_La_ext,
                                      EL_DIAG_DEL, EL_DEL)
                    trace[j + 1, i] = vT_E | vT_E_L

                # early exit (:476-486)
                if (not np.any(vF_ext >= vEF_opn)
                        and not np.any(vF_L_ext >= vEF_L_opn)):
                    done = True
                    break
                vF = vF_ext.copy()
                vFa_ext = vFa - (-ge)
                vFa = np.maximum(vEF_opn, vFa_ext)
                vF_L = vF_L_ext.copy()
                vF_La_ext = vF_La - (-geL)
                vF_La = np.maximum(vEF_L_opn, vF_La_ext)
                vHp = pvHLoad[i].copy()

        # column max bookkeeping (:502-509)
        if np.any(vMaxH > vMaxHUnit):
            score = int(vMaxH.max())
            vMaxHUnit = v(score)
            end_ref = j

    # extraction (:514-552)
    if start_end:
        seg = pvHStore[(Q - 1) % segLen]
        score = int(seg[(Q - 1) // segLen])
        end_query, end_ref = Q - 1, R - 1
    else:
        if end_ref == R - 1:
            pvHMax, pvHStore = pvHStore, pvHMax
        elif end_ref == R - 2:
            pvHMax, pvHLoad = pvHLoad, pvHMax
        flat = pvHMax.reshape(-1)  # [i*16 + s] order like int16* scan
        end_query = Q - 1
        for idx in range(segLen * W):
            if flat[idx] == score:
                temp = idx // W + (idx % W) * segLen
                if temp < end_query:
                    end_query = temp

    # convert trace to (Q, R) cell layout: word(q, r) = trace[r, q%segLen, q//segLen]
    cell = np.zeros((Q, R), np.int16)
    for q in range(Q):
        cell[q, :] = trace[:, q % segLen, q // segLen]
    return score, end_query, end_ref, cell
