"""2-bit packed transport (ops/packed.py) == the direct host encodes it
replaces, bit for bit."""

import numpy as np
import jax.numpy as jnp

from darwin_tpu import genome as G
from darwin_tpu.ops import packed as P


def _ascii(rng, n, n_prob=0.05):
    b = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n)
    nm = rng.random(n) < n_prob
    b[nm] = ord("N")
    return b


def test_pack_unpack_roundtrip(rng):
    for n in (1, 3, 4, 17, 1024, 4093):
        codes = rng.integers(0, 4, n).astype(np.uint8)
        up = np.asarray(P.unpack2(jnp.asarray(P.pack2(codes))))
        assert (up[:n] == codes).all()
        assert (up[n:] == 0).all()
    # 2-D (the seeder's (B, lcap) rows)
    codes = rng.integers(0, 4, (5, 64)).astype(np.uint8)
    up = np.asarray(P.unpack2(jnp.asarray(P.pack2(codes))))
    assert (up == codes).all()


def test_n_boundaries_parity(rng):
    for seed in range(5):
        r = np.random.default_rng(seed)
        bases = _ascii(r, 997, n_prob=0.2)
        if seed == 1:
            bases[:13] = ord("N")          # run at the start
        if seed == 2:
            bases[-7:] = ord("N")          # run at the end
        if seed == 3:
            bases[:] = ord("N")            # all-N
        bounds = P.n_boundaries(bases)
        codes = P.unpack2(jnp.asarray(P.pack2(G.encode2(bases))))
        pos = jnp.arange(len(bases), dtype=jnp.uint32)
        got = np.asarray(P.apply_n(codes[:len(bases)], pos,
                                   jnp.asarray(bounds)))
        assert (got == G.encode5(bases)).all()


def test_codes5_from_packed_matches_encode5(rng):
    store = G.GenomeStore()
    store.add_chromosome("c1", _ascii(rng, 1000))
    store.add_chromosome("c2", _ascii(rng, 517))
    store.finalize()
    margin = 64
    want = G.encode5(np.concatenate(
        [store.bases, np.full(margin, ord("N"), np.uint8)]))
    packed_dev, bounds_dev = P.device_packed(store)
    total = store.size + margin
    bounds_ext = np.concatenate(
        [np.asarray(bounds_dev), [store.size, total]]).astype(np.uint32)
    got = np.asarray(P.codes5_from_packed(
        packed_dev, jnp.asarray(bounds_ext), total, piece=1 << 10))
    assert got.shape == (total,)
    assert (got == want).all()


def test_gather_rows_matches_slices(rng):
    store = G.GenomeStore()
    store.add_chromosome("c1", _ascii(rng, 3000))
    store.finalize()
    packed_dev, _ = P.device_packed(store)
    codes2 = store.codes2
    CL = 96
    # contract: starts are byte-aligned (gstart % 4 == 0) — the streaming
    # builds align row starts down (minimizers._packed_row_batches); the
    # last start reads into the zero pad tail (masked positions)
    starts = np.array([0, 4, 124, 128, 1532, (len(codes2) - CL) & ~3,
                       (len(codes2) - 8) & ~3], np.uint32)
    rows = np.asarray(P.gather_rows(packed_dev, jnp.asarray(starts), CL))
    for i, s in enumerate(starts):
        want = codes2[s:s + CL]
        assert (rows[i][:len(want)] == want).all(), f"row {i} start {s}"
        assert (rows[i][len(want):] == 0).all(), f"pad row {i}"


def test_pad_bounds_parity(rng):
    bases = _ascii(rng, 301, n_prob=0.15)
    bounds = P.n_boundaries(bases)
    m = max(32, 1 << int(np.ceil(np.log2(bounds.shape[0] + 1))))
    padded = P.pad_bounds(bounds, m)
    assert padded.shape == (m,)
    codes = P.unpack2(jnp.asarray(P.pack2(G.encode2(bases))))[:len(bases)]
    pos = jnp.arange(len(bases), dtype=jnp.uint32)
    a = np.asarray(P.apply_n(codes, pos, jnp.asarray(bounds)))
    b = np.asarray(P.apply_n(codes, pos, jnp.asarray(padded)))
    assert (a == b).all()
