"""Device (JAX) batched GACT kernel vs the NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from darwin_tpu.config import Config
from darwin_tpu.ops import gact, oracle as orc
from tests.conftest import mutate, random_codes

CFG = Config()
SUB = np.array(CFG.sub_matrix_5x5, np.int32)
GAPS = (CFG.gap_open, CFG.gap_extend, CFG.long_gap_open, CFG.long_gap_extend)
PARAMS = gact.make_params(CFG)


def _make_batch(rng, B, QT, RT):
    qcodes = np.zeros((B, QT), np.uint8)
    rcodes = np.zeros((B, RT), np.uint8)
    qlens = np.zeros(B, np.int32)
    rlens = np.zeros(B, np.int32)
    start_end = np.zeros(B, bool)
    for b in range(B):
        ql = int(rng.integers(1, QT + 1))
        rl = int(rng.integers(1, RT + 1))
        r = random_codes(rng, rl)
        if b % 2 == 0:
            q = mutate(rng, r)[:ql]
            if len(q) < ql:
                q = np.concatenate([q, random_codes(rng, ql - len(q))])
        else:
            q = random_codes(rng, ql)
        qcodes[b, :ql] = q
        rcodes[b, :rl] = r
        qlens[b] = ql
        rlens[b] = rl
        start_end[b] = b % 3 == 0
    return qcodes, rcodes, qlens, rlens, start_end


def test_batch_align_matches_oracle(rng):
    B, QT, RT = 16, 72, 72
    qcodes, rcodes, qlens, rlens, start_end = _make_batch(rng, B, QT, RT)
    res = gact.batch_align(jnp.asarray(qcodes), jnp.asarray(rcodes),
                           jnp.asarray(qlens), jnp.asarray(rlens),
                           jnp.asarray(start_end), PARAMS, with_trace=True)
    trace = np.asarray(res["trace"])
    for b in range(B):
        s, eq, er, tr = orc.clean_align(
            qcodes[b, :qlens[b]], rcodes[b, :rlens[b]], SUB, *GAPS,
            bool(start_end[b]))
        assert int(res["score"][b]) == s, b
        assert int(res["query_max_pos"][b]) == eq, b
        assert int(res["ref_max_pos"][b]) == er, b
        dev_tr = trace[:rlens[b], b, :qlens[b]].T  # (Q, R), 8-bit layout
        np.testing.assert_array_equal(dev_tr, gact.pack_trace_word(tr),
                                      err_msg=f"tile {b}")


def test_traceback_matches_oracle(rng):
    B, QT, RT = 12, 64, 64
    max_tb = 2 * 64
    qcodes, rcodes, qlens, rlens, start_end = _make_batch(rng, B, QT, RT)
    res = gact.align_and_traceback(
        jnp.asarray(qcodes), jnp.asarray(rcodes), jnp.asarray(qlens),
        jnp.asarray(rlens), jnp.asarray(start_end), PARAMS, max_tb)
    for b in range(B):
        ref = orc.align_with_traceback(
            qcodes[b, :qlens[b]], rcodes[b, :rlens[b]], SUB, *GAPS,
            bool(start_end[b]), max_tb)
        n = int(res["n_ops"][b])
        assert n == len(ref["ops"]), b
        assert list(np.asarray(res["ops"])[b, :n]) == ref["ops"], b
        assert int(res["q_steps"][b]) == ref["query_offset"], b
        assert int(res["r_steps"][b]) == ref["ref_offset"], b


def test_max_tb_cap(rng):
    """max_tb_steps must cap i/j steps exactly like Processor.cpp:616-618."""
    B, QT, RT = 4, 48, 48
    qcodes, rcodes, qlens, rlens, _ = _make_batch(rng, B, QT, RT)
    start_end = np.ones(B, bool)
    qlens[:] = QT
    rlens[:] = RT
    max_tb = 10
    res = gact.align_and_traceback(
        jnp.asarray(qcodes), jnp.asarray(rcodes), jnp.asarray(qlens),
        jnp.asarray(rlens), jnp.asarray(start_end), PARAMS, max_tb)
    for b in range(B):
        ref = orc.align_with_traceback(
            qcodes[b, :qlens[b]], rcodes[b, :rlens[b]], SUB, *GAPS,
            True, max_tb)
        n = int(res["n_ops"][b])
        assert n == len(ref["ops"]), b
        assert list(np.asarray(res["ops"])[b, :n]) == ref["ops"], b
