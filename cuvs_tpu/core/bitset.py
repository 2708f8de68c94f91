"""Packed bit arrays used as search filters.

Reference semantics: ``cuvs::core::bitset_view`` (one shared 1xN bit array,
/root/reference/cpp/include/cuvs/core/bitset.hpp) and ``bitmap_view``
(n_queries x N per-query bits, /root/reference/cpp/include/cuvs/core/bitmap.hpp).
A set bit (1) means "this sample may be returned"; cleared means filtered out.

TPU-native representation: ``uint32`` lanes, little-endian bit order within a
word (bit i of sample j lives at word ``j // 32``, bit ``j % 32``). All ops
are pure elementwise jnp so they fuse into the surrounding distance kernels;
testing a filter inside a search is a gather of ``n/32`` words plus shifts —
VPU-friendly and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

BITS = 32
_DTYPE = jnp.uint32


def num_words(n_bits: int) -> int:
    return (n_bits + BITS - 1) // BITS


def bitset_create(n_bits: int, default: bool = True) -> jnp.ndarray:
    """Create a bitset covering ``n_bits`` samples, all set or all cleared."""
    fill = jnp.uint32(0xFFFFFFFF) if default else jnp.uint32(0)
    return jnp.full((num_words(n_bits),), fill, dtype=_DTYPE)


def bitset_from_mask(mask) -> jnp.ndarray:
    """Pack a boolean [n] mask into a [ceil(n/32)] uint32 bitset."""
    mask = jnp.asarray(mask, dtype=jnp.bool_)
    n = mask.shape[-1]
    pad = (-n) % BITS
    m = jnp.pad(mask, [(0, 0)] * (mask.ndim - 1) + [(0, pad)])
    m = m.reshape(mask.shape[:-1] + (num_words(n), BITS))
    weights = (jnp.uint32(1) << jnp.arange(BITS, dtype=jnp.uint32))
    return jnp.sum(m.astype(_DTYPE) * weights, axis=-1, dtype=_DTYPE)


def bitset_to_mask(bitset: jnp.ndarray, n_bits: int) -> jnp.ndarray:
    """Unpack a bitset into a boolean [n_bits] mask."""
    words = bitset[..., :, None]
    shifts = jnp.arange(BITS, dtype=jnp.uint32)
    bits = (words >> shifts) & jnp.uint32(1)
    flat = bits.reshape(bitset.shape[:-1] + (-1,))
    return flat[..., :n_bits].astype(jnp.bool_)


def bitset_test(bitset: jnp.ndarray, ids) -> jnp.ndarray:
    """Test bits at integer ``ids`` (any shape). Returns bool of ids.shape.

    Out-of-range ids are clamped by jnp gather semantics; callers mask
    padded ids themselves (padded slots use id 0 and are masked later).
    """
    ids = jnp.asarray(ids)
    word = bitset[ids // BITS]
    bit = (ids % BITS).astype(jnp.uint32)
    return ((word >> bit) & jnp.uint32(1)).astype(jnp.bool_)


def bitset_set(bitset: jnp.ndarray, ids, value: bool = True) -> jnp.ndarray:
    """Return a new bitset with bits at ``ids`` set/cleared.

    Duplicate ids are allowed. Implemented as unpack → scatter → repack so
    duplicate bits in the same word cannot carry into neighbor bits.
    """
    ids = jnp.asarray(ids).reshape(-1)
    mask = bitset_to_mask(bitset, bitset.shape[0] * BITS)
    mask = mask.at[ids].set(bool(value))
    return bitset_from_mask(mask)


def bitset_count(bitset: jnp.ndarray, n_bits: int) -> jnp.ndarray:
    """Population count of the first ``n_bits`` bits."""
    return jnp.sum(bitset_to_mask(bitset, n_bits))


# ----------------------------------------------------------------------------
# Bitmap: per-query filter, shape [n_queries, ceil(n/32)]
# ----------------------------------------------------------------------------

def bitmap_from_mask(mask) -> jnp.ndarray:
    """Pack a boolean [n_queries, n] mask into [n_queries, ceil(n/32)]."""
    return bitset_from_mask(mask)


def bitmap_test(bitmap: jnp.ndarray, query_ids, ids) -> jnp.ndarray:
    """Test bitmap[query_ids, ids]; query_ids broadcast against ids."""
    ids = jnp.asarray(ids)
    word = bitmap[query_ids, ids // BITS]
    bit = (ids % BITS).astype(jnp.uint32)
    return ((word >> bit) & jnp.uint32(1)).astype(jnp.bool_)
