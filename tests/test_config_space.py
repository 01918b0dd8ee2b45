"""Non-default scoring configurations vs the oracle.

All golden tests run the default params.cfg scores; the kernels bake the
substitution matrix and gap scores in (the Pallas kernel statically), so a
config-space sweep is the only thing standing between a wiring mistake and
silently wrong output for users with custom params.cfg files.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from darwin_tpu.config import Config
from darwin_tpu.ops import gact, gact_pallas, oracle as orc
from tests.conftest import mutate, random_codes
from tests.test_gact_device import _make_batch

# (gact_sub_mat upper triangle + N, gap_open, gap_extend, long_open, long_ext)
CONFIGS = [
    # default-ish but asymmetric substitution scores
    ((3, -5, -2, -7, 4, -6, -1, 2, -8, 5, -3), -5, -1, -30, -1),
    # transition/transversion-style matrix, single-piece-like long gaps
    ((1, -4, -1, -4, 1, -4, -1, 1, -4, 1, 0), -2, -1, -2, -1),
    # heavy long-gap regime
    ((2, -6, -6, -6, 2, -6, -6, 2, -6, 2, -1), -10, -8, -12, -1),
]


@pytest.mark.parametrize("idx", range(len(CONFIGS)))
def test_custom_scoring_matches_oracle(rng, idx):
    sub_mat, go, ge, gol, gel = CONFIGS[idx]
    cfg = Config()
    cfg.gact_sub_mat = list(sub_mat)
    cfg.gap_open, cfg.gap_extend = go, ge
    cfg.long_gap_open, cfg.long_gap_extend = gol, gel
    params = gact.make_params(cfg)
    SUB = np.array(cfg.sub_matrix_5x5, np.int32)

    B, QT, RT = 10, 56, 64
    qcodes, rcodes, qlens, rlens, start_end = _make_batch(rng, B, QT, RT)
    args = (jnp.asarray(qcodes), jnp.asarray(rcodes), jnp.asarray(qlens),
            jnp.asarray(rlens), jnp.asarray(start_end), params)

    lax_res = gact.align_and_traceback(*args, 2 * QT)
    pal_res = gact_pallas.align_and_traceback(*args, 2 * QT,
                                              interpret=True)
    for b in range(B):
        ref = orc.align_with_traceback(
            qcodes[b, :qlens[b]], rcodes[b, :rlens[b]], SUB,
            go, ge, gol, gel, bool(start_end[b]), 2 * QT)
        assert int(lax_res["score"][b]) == ref["score"], (idx, b)
        assert int(pal_res["score"][b]) == ref["score"], (idx, b)
        n = int(lax_res["n_ops"][b])
        assert n == len(ref["ops"]), (idx, b)
        assert list(np.asarray(lax_res["ops"])[b, :n]) == ref["ops"], (idx, b)
        assert int(pal_res["n_ops"][b]) == n, (idx, b)
        assert list(np.asarray(pal_res["ops"])[b, :n]) == ref["ops"], (idx, b)


# generic-domain scorings (open cheaper than extend on one or both lanes)
GENERIC_CONFIGS = [
    (-1, -5, -3, -9),     # both lanes open < extend
    (-1, -5, -25, -1),    # short lane generic, long lane prefix
    (-4, -2, -3, -9),     # short lane prefix, long lane generic
    (-2, -7, -2, -7),     # identical lanes, generic
]


@pytest.mark.parametrize("gaps", GENERIC_CONFIGS)
def test_open_cheaper_than_extend_generic_path(rng, gaps):
    """gap_open > gap_extend invalidates the prefix-max gap scan; such
    scorings (the reference accepts any, software/Processor.cpp:48-80) run
    the generic closed-form path in BOTH kernels — the lax kernel's
    max-plus associative scan and the Pallas kernel's shared-p3 scan
    (gact_pallas._dp_kernel `generic` branch) — and must match the
    oracle's coupled recurrence exactly."""
    cfg = Config()
    cfg.gap_open, cfg.gap_extend = gaps[0], gaps[1]
    cfg.long_gap_open, cfg.long_gap_extend = gaps[2], gaps[3]
    params = gact.make_params(cfg)
    assert not gact.prefix_ok(params)
    SUB = np.array(cfg.sub_matrix_5x5, np.int32)

    B, QT, RT = 8, 48, 56
    qcodes, rcodes, qlens, rlens, start_end = _make_batch(rng, B, QT, RT)
    args = (jnp.asarray(qcodes), jnp.asarray(rcodes), jnp.asarray(qlens),
            jnp.asarray(rlens), jnp.asarray(start_end), params)
    res = gact.align_and_traceback(*args, 2 * QT)
    pal = gact_pallas.align_and_traceback(*args, 2 * QT, interpret=True)
    for b in range(B):
        ref = orc.align_with_traceback(
            qcodes[b, :qlens[b]], rcodes[b, :rlens[b]], SUB,
            cfg.gap_open, cfg.gap_extend, cfg.long_gap_open,
            cfg.long_gap_extend, bool(start_end[b]), 2 * QT)
        assert int(res["score"][b]) == ref["score"], b
        n = int(res["n_ops"][b])
        assert n == len(ref["ops"]), b
        assert list(np.asarray(res["ops"])[b, :n]) == ref["ops"], b
        assert int(pal["score"][b]) == ref["score"], b
        assert int(pal["n_ops"][b]) == n, b
        assert list(np.asarray(pal["ops"])[b, :n]) == ref["ops"], b


def test_generic_strip_kernel_matches_lax(rng):
    """Large-tile (strip-kernel) geometry under a generic scoring: the
    p3m carry must reproduce the cross-strip prefix exactly."""
    cfg = Config()
    cfg.gap_open, cfg.gap_extend = -1, -5
    cfg.long_gap_open, cfg.long_gap_extend = -3, -9
    params = gact.make_params(cfg)

    B, QT, RT = 4, 640, 96      # QT > 512 -> strip path, 2 strips
    qcodes, rcodes, qlens, rlens, _ = _make_batch(rng, B, QT, RT)
    qlens = np.maximum(qlens, 520)    # cross the strip boundary
    start_end = np.ones(B, bool)
    args = (jnp.asarray(qcodes), jnp.asarray(rcodes), jnp.asarray(qlens),
            jnp.asarray(rlens), jnp.asarray(start_end), params)
    lax_res = gact.batch_align(*args, with_trace=True, all_start_end=True)
    pal_res = gact_pallas.batch_align(*args, all_start_end=True,
                                      interpret=True)
    assert np.array_equal(np.asarray(lax_res["score"]),
                          np.asarray(pal_res["score"]))
    # trace layouts differ: lax (RT, B, QT) vs pallas (RT, QT, B)
    lt = np.asarray(lax_res["trace"])
    pt = np.asarray(pal_res["trace"]).transpose(0, 2, 1)
    for b in range(B):
        assert np.array_equal(lt[:rlens[b], b, :qlens[b]],
                              pt[:rlens[b], b, :qlens[b]]), b
