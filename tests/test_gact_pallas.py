"""Pallas DP kernel (interpret mode) vs the lax reference implementation.

The lax implementation (gact.batch_align) is itself oracle-checked in
test_gact_device.py; this locks the Pallas kernel (gact_pallas) to it
bit-for-bit — scores, max positions, trace words, and the full traceback —
including ragged lengths, start_end vs max-cell modes, and lane/QT padding.
"""

import numpy as np
import jax.numpy as jnp

from darwin_tpu.config import Config
from darwin_tpu.ops import gact, gact_pallas
from tests.test_gact_device import _make_batch

CFG = Config()
PARAMS = gact.make_params(CFG)


def test_pallas_matches_lax(rng):
    B, QT, RT = 16, 72, 72
    qcodes, rcodes, qlens, rlens, start_end = _make_batch(rng, B, QT, RT)
    args = (jnp.asarray(qcodes), jnp.asarray(rcodes), jnp.asarray(qlens),
            jnp.asarray(rlens), jnp.asarray(start_end), PARAMS)
    ref = gact.batch_align(*args, with_trace=True)
    pal = gact_pallas.batch_align(*args, with_trace=True, interpret=True)
    for k in ("score", "query_max_pos", "ref_max_pos"):
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(pal[k]),
                                      err_msg=k)
    tr_ref = np.asarray(ref["trace"])     # (RT, B, QT)
    tr_pal = np.asarray(pal["trace"])     # (RT, QTpad, Bpad)
    for b in range(B):
        np.testing.assert_array_equal(
            tr_ref[:rlens[b], b, :qlens[b]],
            tr_pal[:rlens[b], :qlens[b], b], err_msg=f"tile {b}")


def test_pallas_traceback_matches_lax(rng):
    B, QT, RT = 12, 64, 80
    qcodes, rcodes, qlens, rlens, start_end = _make_batch(rng, B, QT, RT)
    args = (jnp.asarray(qcodes), jnp.asarray(rcodes), jnp.asarray(qlens),
            jnp.asarray(rlens), jnp.asarray(start_end), PARAMS)
    ref = gact.align_and_traceback(*args, 2 * QT)
    pal = gact_pallas.align_and_traceback(*args, 2 * QT, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref["n_ops"]),
                                  np.asarray(pal["n_ops"]))
    np.testing.assert_array_equal(np.asarray(ref["q_steps"]),
                                  np.asarray(pal["q_steps"]))
    np.testing.assert_array_equal(np.asarray(ref["r_steps"]),
                                  np.asarray(pal["r_steps"]))
    ops_ref = np.asarray(ref["ops"])
    ops_pal = np.asarray(pal["ops"])
    for b in range(B):
        n = int(ref["n_ops"][b])
        np.testing.assert_array_equal(ops_ref[b, :n], ops_pal[b, :n],
                                      err_msg=f"tile {b}")


def test_pallas_max_tb_cap(rng):
    """The sweep traceback checks the max_tb_steps caps per inner
    iteration; must truncate exactly like the serial walker."""
    B, QT, RT = 8, 48, 48
    qcodes, rcodes, qlens, rlens, _ = _make_batch(rng, B, QT, RT)
    se = np.ones(B, bool)
    qlens[:] = QT
    rlens[:] = RT
    args = (jnp.asarray(qcodes), jnp.asarray(rcodes), jnp.asarray(qlens),
            jnp.asarray(rlens), jnp.asarray(se), PARAMS)
    for max_tb in (7, 10):
        ref = gact.align_and_traceback(*args, max_tb)
        pal = gact_pallas.align_and_traceback(*args, max_tb,
                                              interpret=True)
        np.testing.assert_array_equal(np.asarray(ref["n_ops"]),
                                      np.asarray(pal["n_ops"]))
        np.testing.assert_array_equal(np.asarray(ref["q_steps"]),
                                      np.asarray(pal["q_steps"]))
        np.testing.assert_array_equal(np.asarray(ref["r_steps"]),
                                      np.asarray(pal["r_steps"]))
        ops_ref = np.asarray(ref["ops"])
        ops_pal = np.asarray(pal["ops"])
        for b in range(B):
            n = int(ref["n_ops"][b])
            np.testing.assert_array_equal(ops_ref[b, :n], ops_pal[b, :n],
                                          err_msg=f"tile {b} cap {max_tb}")


def test_pallas_all_start_end_mode(rng):
    """The extend-tile specialization (max tracking compiled out)."""
    B, QT, RT = 8, 48, 48
    qcodes, rcodes, qlens, rlens, _ = _make_batch(rng, B, QT, RT)
    se = np.ones(B, bool)
    args = (jnp.asarray(qcodes), jnp.asarray(rcodes), jnp.asarray(qlens),
            jnp.asarray(rlens), jnp.asarray(se), PARAMS)
    ref = gact.align_and_traceback(*args, 2 * QT, all_start_end=True)
    pal = gact_pallas.align_and_traceback(*args, 2 * QT, all_start_end=True,
                                          interpret=True)
    np.testing.assert_array_equal(np.asarray(ref["score"]),
                                  np.asarray(pal["score"]))
    np.testing.assert_array_equal(np.asarray(ref["n_ops"]),
                                  np.asarray(pal["n_ops"]))
    # ops width differs (the kernel pads QT, so L = QTpad + RT); the
    # emitted prefix must be identical
    ops_ref = np.asarray(ref["ops"])
    ops_pal = np.asarray(pal["ops"])
    for b in range(B):
        n = int(ref["n_ops"][b])
        np.testing.assert_array_equal(ops_ref[b, :n], ops_pal[b, :n],
                                      err_msg=f"tile {b}")


def test_pallas_large_tile_strips(rng):
    """Large-tile (QT > 512) strip kernel vs the lax reference: the strip
    boundary carries (hb/mf/mfl/rawl) must reproduce the monolithic DP
    bit-for-bit, including trace words and the full traceback."""
    B, QT, RT = 8, 600, 32
    qcodes, rcodes, qlens, rlens, _ = _make_batch(rng, B, QT, RT)
    qlens = np.maximum(qlens, 520)  # reach into strip 2
    se = np.ones(B, bool)
    args = (jnp.asarray(qcodes), jnp.asarray(rcodes), jnp.asarray(qlens),
            jnp.asarray(rlens), jnp.asarray(se), PARAMS)
    ref = gact.batch_align(*args, with_trace=True, all_start_end=True)
    pal = gact_pallas.batch_align(*args, with_trace=True,
                                  all_start_end=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref["score"]),
                                  np.asarray(pal["score"]))
    tr_ref = np.asarray(ref["trace"])     # (RT, B, QT)
    tr_pal = np.asarray(pal["trace"])     # (RT, QTpad, Bpad)
    for b in range(B):
        np.testing.assert_array_equal(
            tr_ref[:rlens[b], b, :qlens[b]],
            tr_pal[:rlens[b], :qlens[b], b], err_msg=f"tile {b}")

    reft = gact.align_and_traceback(*args, 2 * QT, all_start_end=True)
    palt = gact_pallas.align_and_traceback(*args, 2 * QT,
                                           all_start_end=True,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(reft["n_ops"]),
                                  np.asarray(palt["n_ops"]))
    ops_ref = np.asarray(reft["ops"])
    ops_pal = np.asarray(palt["ops"])
    for b in range(B):
        n = int(reft["n_ops"][b])
        np.testing.assert_array_equal(ops_ref[b, :n], ops_pal[b, :n],
                                      err_msg=f"tile {b}")


def test_safe_traceback_kernel_and_spill(rng):
    """The while-based safe sweep (_tb_kernel_safe) is the recovery path
    when the fast sweep spills on a multi-run column; it must (a) compile
    and run, (b) agree with the fast kernel on ordinary traces, and (c)
    correctly walk a hand-built multi-run column that makes the fast
    kernel raise its spill flag."""
    # (a)+(b): ordinary batch, fast vs safe bit-identical, no spill
    B, QT, RT = 8, 64, 64
    qcodes, rcodes, qlens, rlens, _ = _make_batch(rng, B, QT, RT)
    se = np.ones(B, bool)
    res = gact_pallas.batch_align(
        jnp.asarray(qcodes), jnp.asarray(rcodes), jnp.asarray(qlens),
        jnp.asarray(rlens), jnp.asarray(se), PARAMS, with_trace=True,
        all_start_end=True, interpret=True)
    tbq = jnp.asarray(qlens - 1)
    tbr = jnp.asarray(rlens - 1)
    rec_f, qs_f, rs_f, spill = gact_pallas._tb_call(
        res["trace"], tbq, tbr, 2 * QT, True)
    rec_s, qs_s, rs_s, spill_s = gact_pallas._tb_call(
        res["trace"], tbq, tbr, 2 * QT, True, safe=True)
    assert not np.asarray(spill).any()
    assert not np.asarray(spill_s).any()
    np.testing.assert_array_equal(np.asarray(rec_f), np.asarray(rec_s))
    np.testing.assert_array_equal(np.asarray(qs_f), np.asarray(qs_s))
    np.testing.assert_array_equal(np.asarray(rs_f), np.asarray(rs_s))

    # (c): synthetic trace with TWO I-runs in one column (only reachable
    # through exact gap-lane ties in real scorings)
    QT2, RT2 = 32, 8
    tr = np.zeros((RT2, QT2, 128), np.uint8)
    INS, INS_L, DIAG = gact.T8_INS, gact.T8_INS_L, gact.T8_DIAG
    tr[3, 5, 0] = INS                       # run 1: ext
    tr[3, 4, 0] = INS | gact.F_OPEN8        # run 1: open -> DIAG
    tr[3, 3, 0] = INS_L | gact.FL_OPEN8     # run 2 (one cell) -> DIAG
    tr[3, 2, 0] = DIAG                      # closing M
    tr[2, 1, 0] = 0                         # ZERO: walk ends
    sq = np.array([5], np.int32)
    sr = np.array([3], np.int32)
    rec_f, qsf, rsf, spill = gact_pallas._tb_call(
        jnp.asarray(tr), jnp.asarray(sq), jnp.asarray(sr), 64, True)
    assert np.asarray(spill)[0] == 1        # fast kernel flags the case
    rec_s, qss, rss, spill_s = gact_pallas._tb_call(
        jnp.asarray(tr), jnp.asarray(sq), jnp.asarray(sr), 64, True,
        safe=True)
    assert np.asarray(spill_s)[0] == 0
    ops, n_ops = gact_pallas._expand_records(
        np.asarray(rec_s)[:, :1], 1, QT2 + RT2)
    assert list(ops[0][:int(n_ops[0])]) == [1, 1, 1, 3]  # I I I M
    assert int(np.asarray(qss)[0]) == 4 and int(np.asarray(rss)[0]) == 1
    # lax walker agrees on the same trace (row layout; it takes full-B
    # start vectors, inactive lanes start at -1)
    sq_p = np.full(128, -1, np.int32)
    sr_p = np.full(128, -1, np.int32)
    sq_p[0], sr_p[0] = sq[0], sr[0]
    lax_tb = gact.batch_traceback(
        jnp.asarray(tr.transpose(0, 2, 1)), jnp.asarray(sq_p),
        jnp.asarray(sr_p), 64)
    assert list(np.asarray(lax_tb["ops"])[0][:4]) == [1, 1, 1, 3]
    assert int(lax_tb["q_steps"][0]) == 4
    assert int(lax_tb["r_steps"][0]) == 1


def test_per_lane_spill_recovery(rng, monkeypatch):
    """When the fast sweep spills, align_and_traceback must rerun ONLY the
    spilled lanes (gathered into a 128-multiple batch) through the safe
    kernel — not the whole batch — and still produce identical results.
    Forced here by patching _tb_call to raise a phantom spill on two lanes
    (fast and safe agree on ordinary traces, so the merged output must
    equal the unpatched run)."""
    B, QT, RT = 160, 48, 48          # pads to 256 lanes; recovery uses 128
    qcodes, rcodes, qlens, rlens, _ = _make_batch(rng, B, QT, RT)
    se = np.ones(B, bool)
    args = (jnp.asarray(qcodes), jnp.asarray(rcodes), jnp.asarray(qlens),
            jnp.asarray(rlens), jnp.asarray(se), PARAMS)
    clean = gact_pallas.align_and_traceback(*args, 2 * QT, interpret=True)

    orig = gact_pallas._tb_call
    calls = []

    def spy(trace, sq, sr, max_tb, interpret, safe=False):
        rec, qs, rs, spill = orig(trace, sq, sr, max_tb, interpret,
                                  safe=safe)
        calls.append((safe, trace.shape[2]))
        if not safe and len(calls) == 1:
            spill = jnp.asarray(spill).at[3].set(1).at[140].set(1)
        return rec, qs, rs, spill

    monkeypatch.setattr(gact_pallas, "_tb_call", spy)
    pat = gact_pallas.align_and_traceback(*args, 2 * QT, interpret=True)
    # one fast call over the full batch + one safe call over 128 gathered
    # lanes (2 spilled lanes -> one lane block, NOT the 256-lane batch)
    assert calls == [(False, 256), (True, 128)]
    np.testing.assert_array_equal(np.asarray(clean["n_ops"]),
                                  np.asarray(pat["n_ops"]))
    np.testing.assert_array_equal(np.asarray(clean["ops"]),
                                  np.asarray(pat["ops"]))
    np.testing.assert_array_equal(np.asarray(clean["q_steps"]),
                                  np.asarray(pat["q_steps"]))
    np.testing.assert_array_equal(np.asarray(clean["r_steps"]),
                                  np.asarray(pat["r_steps"]))


def test_subset_requests():
    from darwin_tpu.ops.dispatch import _subset_requests
    req = np.arange(9 * 7, dtype=np.uint32).reshape(9, 7)
    idx = np.array([2, 5])
    sub = np.asarray(_subset_requests(req, idx))
    assert sub.shape == (9, 128)
    np.testing.assert_array_equal(sub[:, 0], req[:, 2])
    np.testing.assert_array_equal(sub[:, 1], req[:, 5])
    # benign padding: sizes 1 (rows 1/3/6/8), addresses 0
    assert (sub[1, 2:] == 1).all() and (sub[3, 2:] == 1).all()
    assert (sub[6, 2:] == 1).all() and (sub[8, 2:] == 1).all()
    assert (sub[0, 2:] == 0).all() and (sub[2, 2:] == 0).all()
