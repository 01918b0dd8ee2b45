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
