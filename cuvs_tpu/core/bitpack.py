"""Bit-packed fixed-width code storage (b-bit codes in uint32 words).

Reference semantics: ``cuvs::neighbors::ivf_pq`` code packing
(/root/reference/cpp/src/neighbors/ivf_pq/ivf_pq_codepacking.cuh:22-135
packs pq_bits-wide bitfields contiguously) and the RaBitQ 1-9-bit code
layout (/root/reference/cpp/include/cuvs/neighbors/ivf_rabitq.hpp:54).
The HBM footprint of a packed row is ``ceil(n_codes * bits / 8)`` bytes —
index-memory parity with the reference regardless of ``bits``.

TPU-native layout: codes for one vector are packed little-endian into a
row of uint32 words (lane dtype of the VPU). Code ``s`` occupies bit range
``[s*bits, (s+1)*bits)``; since ``s`` ranges over a static axis, the word
indices and shifts for every code are compile-time constants, so unpacking
is static slices + shifts + masks — pure fused VPU work, no gathers.
"""

from __future__ import annotations

import jax.numpy as jnp

WORD = 32
_U32 = jnp.uint32


def packed_words(n_codes: int, bits: int) -> int:
    """uint32 words needed for ``n_codes`` codes of ``bits`` bits."""
    return (n_codes * bits + WORD - 1) // WORD


def packed_bytes(n_codes: int, bits: int) -> int:
    """Reference-parity byte count of one packed row."""
    return packed_words(n_codes, bits) * 4


def pack(codes: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Pack integer codes [..., S] (each < 2**bits) into [..., W] uint32.

    Little-endian within and across words: code s -> bits [s*bits, s*bits+bits).
    """
    if not 1 <= bits <= 32:
        raise ValueError("bits must be in [1, 32]")
    c = jnp.asarray(codes).astype(_U32) & _U32((1 << bits) - 1 if bits < 32 else 0xFFFFFFFF)
    S = c.shape[-1]
    W = packed_words(S, bits)
    out = jnp.zeros(c.shape[:-1] + (W,), _U32)
    for s in range(S):
        lo = s * bits
        w0, sh = lo // WORD, lo % WORD
        out = out.at[..., w0].add(c[..., s] << _U32(sh))
        if sh + bits > WORD:  # spills into the next word
            out = out.at[..., w0 + 1].add(c[..., s] >> _U32(WORD - sh))
    return out


def unpack(packed: jnp.ndarray, bits: int, n_codes: int) -> jnp.ndarray:
    """Unpack [..., W] uint32 rows into int32 codes [..., n_codes].

    All word indices/shifts are static per code position, so this lowers to
    S fused shift/mask ops (plus a second word OR where a code straddles a
    word boundary).
    """
    p = jnp.asarray(packed, _U32)
    mask = _U32((1 << bits) - 1 if bits < 32 else 0xFFFFFFFF)
    cols = []
    for s in range(n_codes):
        lo = s * bits
        w0, sh = lo // WORD, lo % WORD
        v = p[..., w0] >> _U32(sh)
        if sh + bits > WORD:
            v = v | (p[..., w0 + 1] << _U32(WORD - sh))
        cols.append((v & mask).astype(jnp.int32))
    return jnp.stack(cols, axis=-1)
