"""2-bit packed sequence transport: upload genomes/reads once, 4 bases per
byte, and derive every device code buffer on chip.

The reference keeps ONE resident copy of every sequence (the 4 GiB DRAM
buffer, software/DRAM.cpp:8-13) and the FPGA seam uploads it once
(software/sender.cpp:4-97).  Round 3 measured the axon tunnel at ~15 MB/s,
so shipping a 3.2 Gbp genome as 1-byte codes (3.2 GB, and the streaming
index build re-sent it twice more as row batches) dominated both the index
build (443 s) and the align-phase read upload.  This module makes the
tunnel cost 2 bits/base, once:

* hosts pack 2-bit codes 4-per-byte (``pack2``) and extract the non-ACGT
  run boundaries (``n_boundaries``) — N positions are the only information
  the 2-bit codes lose;
* the device unpacks (``unpack2``), reapplies N via a boundary-parity
  lookup (``apply_n``: position is N iff searchsorted(bounds, i, right) is
  odd), gathers row windows for the streaming index builds
  (``gather_rows``), and materializes the 5-letter code buffers the
  filter/extension gathers read (``codes5_from_packed``).

Everything derived here is bit-identical to the direct host encode5/encode2
uploads it replaces (tests/test_packed.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_ACGT_MASK = np.zeros(256, bool)
for _c in b"acgtACGT":
    _ACGT_MASK[_c] = True


def pack2(codes2: np.ndarray) -> np.ndarray:
    """Pack 2-bit codes (values 0..3) 4 per byte, code i at bits 2*(i%4).
    Length is padded up to a multiple of 4 with zeros."""
    n = codes2.shape[-1]
    n4 = -(-n // 4) * 4
    if codes2.ndim == 1:
        buf = np.zeros(n4, np.uint8)
        buf[:n] = codes2
        q = buf.reshape(-1, 4)
    else:
        buf = np.zeros((codes2.shape[0], n4), np.uint8)
        buf[:, :n] = codes2
        q = buf.reshape(codes2.shape[0], -1, 4)
    return (q[..., 0] | (q[..., 1] << 2) | (q[..., 2] << 4)
            | (q[..., 3] << 6)).astype(np.uint8)


def n_boundaries(bases: np.ndarray) -> np.ndarray:
    """Run boundaries of non-ACGT bytes: uint32 [s0, e0, s1, e1, ...] with
    position p non-ACGT iff an odd number of boundaries are <= p."""
    isn = ~_ACGT_MASK[bases]
    d = np.diff(isn.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if isn[0]:
        starts = np.concatenate([[0], starts])
    if isn[-1]:
        ends = np.concatenate([ends, [len(bases)]])
    out = np.empty(2 * len(starts), np.uint32)
    out[0::2] = starts
    out[1::2] = ends
    return out


def unpack2(packed: jnp.ndarray) -> jnp.ndarray:
    """(..., nb) packed bytes -> (..., 4*nb) uint8 codes 0..3."""
    sh = jnp.arange(4, dtype=jnp.uint8) * 2
    c = (packed[..., None] >> sh) & jnp.uint8(3)
    return c.reshape(*packed.shape[:-1], packed.shape[-1] * 4)


def apply_n(codes: jnp.ndarray, pos_u32: jnp.ndarray,
            bounds: jnp.ndarray) -> jnp.ndarray:
    """codes with positions inside an N run replaced by 4.  ``bounds`` is
    the n_boundaries array (uint32, even length, ascending)."""
    if bounds.shape[0] == 0:
        return codes
    r = jnp.searchsorted(bounds, pos_u32, side="right")
    return jnp.where((r & 1) == 1, jnp.uint8(4), codes)


@functools.partial(jax.jit, static_argnames=("CL",))
def gather_rows(packed, gstart_u32, CL: int):
    """Gather (R, CL) uint8 2-bit code rows starting at arbitrary global
    positions from the resident packed buffer (the streaming index builds'
    row batches — no per-batch genome re-upload).  Reads past the buffer
    end return the last byte's codes; callers mask by length."""
    R = gstart_u32.shape[0]
    nb = CL // 4 + 1
    npk = packed.shape[0]
    if gstart_u32.dtype != jnp.uint32:     # int32-staged bit pattern
        gstart_u32 = jax.lax.bitcast_convert_type(gstart_u32, jnp.uint32)
    b0 = (gstart_u32 >> 2).astype(jnp.int32)
    bidx = jnp.clip(b0[:, None] + jnp.arange(nb, dtype=jnp.int32)[None, :],
                    0, npk - 1)
    codes = unpack2(jnp.take(packed, bidx))          # (R, 4*nb)
    sh = (gstart_u32 & 3).astype(jnp.int32)
    col = sh[:, None] + jnp.arange(CL, dtype=jnp.int32)[None, :]
    return jnp.take_along_axis(codes, col, axis=1)


@functools.partial(jax.jit, static_argnames=("L",))
def _codes5_piece(packed, bounds, base, L: int):
    """(L,) uint8 5-letter codes for global positions [base, base+L):
    unpack + N-parity overwrite.  base must be a multiple of 4."""
    nb = L // 4
    b0 = (base >> jnp.uint32(2)).astype(jnp.int32)
    npk = packed.shape[0]
    bidx = jnp.clip(b0 + jnp.arange(nb, dtype=jnp.int32), 0, npk - 1)
    codes = unpack2(jnp.take(packed, bidx))
    pos = base + jnp.arange(L, dtype=jnp.uint32)
    return apply_n(codes, pos, bounds)


@functools.partial(jax.jit, donate_argnums=(0,))
def _paste1(dst, part, off):
    return jax.lax.dynamic_update_slice(dst, part, (off,))


@functools.partial(jax.jit, donate_argnums=(0,))
def _paste2(dst, part, c, off):
    return jax.lax.dynamic_update_slice(dst, part[None, :], (c, off))


def codes5_from_packed(packed_dev, bounds_dev, total_len: int,
                       piece: int = 1 << 26):
    """Materialize the (total_len,) uint8 5-letter code buffer on device
    from the resident packed genome — replaces the encode5 host upload for
    the filter/extension gathers.  Returns the chunk_ref_codes layout:
    1-D below 2^31 elements, else (n_chunks, 2^30) chunked.

    The destination is donated through every paste, so peak transient HBM
    is one `piece` plus its decode intermediates (~6x piece = 400 MB at
    2^26; 2^28 pieces OOM'd a 16 GB chip holding the 3.2 Gbp w=3 csr
    table).  Positions past the packed data (the chunk padding tail) read
    clipped bytes but every such position is >= total_len and only
    reachable through masked padding lanes (ops/dispatch._gather_seq)."""
    from darwin_tpu.ops.dispatch import CHUNK_ELEMS
    assert piece % 4 == 0

    if total_len <= (1 << 31) - (1 << 20):
        # quantize to 1 MB and cut power-of-two pieces so piece lengths —
        # a static jit arg — come from a bounded set across read batches
        # of any size (no per-batch-length recompiles)
        q = 1 << 20
        n1 = -(-total_len // q) * q
        out = jnp.zeros((n1,), jnp.uint8)
        off = 0
        while off < n1:
            rem = n1 - off                  # multiple of q, so the
            L = min(piece, 1 << (rem.bit_length() - 1))  # pow2 floor >= q
            part = _codes5_piece(packed_dev, bounds_dev, jnp.uint32(off), L)
            out = _paste1(out, part, jnp.int32(off))
            off += L
        return out[:total_len] if n1 != total_len else out
    n_chunks = -(-total_len // CHUNK_ELEMS)
    out = jnp.zeros((n_chunks, CHUNK_ELEMS), jnp.uint8)
    for c in range(n_chunks):
        for off in range(0, CHUNK_ELEMS, piece):
            L = min(piece, CHUNK_ELEMS - off)
            part = _codes5_piece(packed_dev, bounds_dev,
                                 jnp.uint32(c * CHUNK_ELEMS + off), L)
            out = _paste2(out, part, jnp.int32(c), jnp.int32(off))
    return out


def pad_bounds(bounds: np.ndarray, m: int) -> np.ndarray:
    """Pad a boundary list to length m with 0xFFFFFFFF pairs.  Appended
    pairs are parity-neutral for every reachable position (they add 0 or 2
    boundaries <= p), so apply_n is unchanged — padding exists purely to
    keep the jit shape stable across read batches."""
    assert m >= bounds.shape[0] and m % 2 == 0
    out = np.full(m, 0xFFFFFFFF, np.uint32)
    out[:bounds.shape[0]] = bounds
    return out


# ---------------------------------------------------------------------------
# per-store device handle
# ---------------------------------------------------------------------------

def device_packed(store):
    """One-time device upload of a GenomeStore's packed 2-bit codes +
    non-ACGT run boundaries, memoized on the store.  Returns
    (packed_dev, bounds_dev)."""
    cached = getattr(store, "_packed_dev", None)
    if cached is not None:
        return cached
    packed = pack2(store.codes2)
    bounds = n_boundaries(store.bases)
    packed_dev = jnp.asarray(packed)
    bounds_dev = jnp.asarray(bounds)
    store._packed_dev = (packed_dev, bounds_dev)
    return store._packed_dev
