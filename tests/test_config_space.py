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


def test_open_cheaper_than_extend_generic_path(rng):
    """gap_open > gap_extend invalidates the prefix-max gap scan; such
    scorings (the reference accepts any, software/Processor.cpp:48-80) are
    routed through the lax kernel's generic max-plus scan end-to-end
    (dispatch.use_pallas_for) and must match the oracle's coupled
    recurrence exactly."""
    cfg = Config()
    cfg.gap_open, cfg.gap_extend = -1, -5
    cfg.long_gap_open, cfg.long_gap_extend = -3, -9
    params = gact.make_params(cfg)
    assert not gact.prefix_ok(params)
    from darwin_tpu.ops.dispatch import use_pallas_for
    assert not use_pallas_for(params)
    SUB = np.array(cfg.sub_matrix_5x5, np.int32)

    B, QT, RT = 8, 48, 56
    qcodes, rcodes, qlens, rlens, start_end = _make_batch(rng, B, QT, RT)
    args = (jnp.asarray(qcodes), jnp.asarray(rcodes), jnp.asarray(qlens),
            jnp.asarray(rlens), jnp.asarray(start_end), params)
    res = gact.align_and_traceback(*args, 2 * QT)
    for b in range(B):
        ref = orc.align_with_traceback(
            qcodes[b, :qlens[b]], rcodes[b, :rlens[b]], SUB,
            cfg.gap_open, cfg.gap_extend, cfg.long_gap_open,
            cfg.long_gap_extend, bool(start_end[b]), 2 * QT)
        assert int(res["score"][b]) == ref["score"], b
        n = int(res["n_ops"][b])
        assert n == len(ref["ops"]), b
        assert list(np.asarray(res["ops"])[b, :n]) == ref["ops"], b

    # the Pallas kernels must refuse (prefix-scan only) rather than
    # silently miscompute
    with pytest.raises(ValueError):
        gact_pallas._static_params(params)
