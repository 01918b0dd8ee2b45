"""Device (w,k)-minimizer extraction.

Semantics match the reference's ``iterate_minimizers``
(software/seed_pos_table.h:518-535, scalar oracle at
software/ntcoding.cpp:145-172):

* k-mer at position p packs bases little-endian: base p occupies the LOW two
  bits (GetSeedAtPos, software/ntcoding.h:45-54).
* hash32 is the invertible Wang-style hash masked to 2k bits
  (software/ntcoding.h:56-67).
* m[p] = min over hashes of k-mers starting in the window [p-w+1, p].
* Scan range: p in [w-1, R-k) with R = the sequence length rounded UP to a
  multiple of 16 (qlen_centinel, software/seed_pos_table.h:298,392,463);
  bases beyond the true length are the DRAM 'N' padding, which the 2-bit
  packer folds to code 0 (software/seed_pos_table.h:68-74).
* Emission (software/seed_pos_table.h:342-348): with state last_m=0,
  last_p=0, emit (p, m[p]) when m != last_m or p - last_p >= w; then update.

The sequential emission automaton has a closed form used here (proof: every
change of m forces an emission, so the "last emitted" anchor is always the
start of the current equal-m run, or position 0 for the initial virtual
m=0 run):  emit(p) <=> (p - anchor(p)) % w == 0, where anchor(p) is the
largest p' <= p with m[p'] != m[p'-1] (m[w-2] := 0), else 0.  anchor is a
prefix max — ``lax.cummax`` — so the whole scan is branch-free and
vectorizes over a batch of sequences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def hash32(key, k: int):
    """software/ntcoding.h:56-67, on uint32 arrays."""
    m = jnp.uint32((1 << (2 * k)) - 1)
    key = key.astype(jnp.uint32)
    key = (~key + (key << 21)) & m
    key = key ^ (key >> 24)
    key = (key + (key << 3) + (key << 8)) & m
    key = key ^ (key >> 14)
    key = (key + (key << 2) + (key << 4)) & m
    key = key ^ (key >> 28)
    key = (key + (key << 31)) & m
    return key


@functools.partial(jax.jit, static_argnames=("k",))
def kmer_hashes(codes2, k: int):
    """codes2: (B, L) uint8 2-bit codes -> (B, L-k+1) uint32 hashed k-mers."""
    L = codes2.shape[-1]
    P = L - k + 1
    kmer = jnp.zeros(codes2.shape[:-1] + (P,), jnp.uint32)
    for i in range(k):
        kmer = kmer | (codes2[..., i:i + P].astype(jnp.uint32) << (2 * i))
    return hash32(kmer, k)


@functools.partial(jax.jit, static_argnames=("k", "w"))
def minimizer_scan(codes2, lengths, k: int, w: int):
    """Batched minimizer extraction.

    codes2 : (B, L) uint8, 2-bit codes, padding beyond each row's length
             must be 0 (the 'N' fold).  L must be a multiple of 16 and at
             least round16(max length).
    lengths: (B,) int32 true sequence lengths.

    Returns (mins, emit): mins (B, P) uint32 window minima, emit (B, P) bool
    emission mask, with P = L - k + 1; minimizer position p = array index.
    """
    B, L = codes2.shape
    assert L % 16 == 0
    h = kmer_hashes(codes2, k)                      # (B, P)
    P = h.shape[1]

    big = jnp.uint32(0xFFFFFFFF)
    m = h
    for d in range(1, w):
        shifted = jnp.concatenate(
            [jnp.full((B, d), big, jnp.uint32), h[:, :P - d]], axis=1)
        m = jnp.minimum(m, shifted)

    p_idx = jnp.arange(P, dtype=jnp.int32)[None, :]
    m_prev = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.uint32), m[:, :-1]], axis=1)
    # m[w-2] treated as the initial last_m = 0; positions < w-1 are invalid
    # and masked, so only change[w-1] = (m[w-1] != 0) matters there.
    change = (p_idx >= w - 1) & (
        m != jnp.where(p_idx == w - 1, jnp.uint32(0), m_prev))
    anchor = jax.lax.cummax(
        jnp.where(change, p_idx, 0), axis=1)

    r16 = ((lengths + 15) // 16) * 16               # qlen_centinel + k
    valid = (p_idx >= w - 1) & (p_idx < (r16 - k)[:, None])
    emit = valid & (((p_idx - anchor) % w) == 0)
    return m, emit
