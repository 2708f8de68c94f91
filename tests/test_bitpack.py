"""Round-trip and layout tests for core.bitpack (reference parity:
ivf_pq_codepacking.cuh bitfield layout, ivf_rabitq.hpp:54 1-9 bit codes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuvs_tpu.core import bitpack


@pytest.mark.parametrize("bits", [1, 2, 3, 4, 5, 6, 7, 8, 9, 12, 16])
def test_roundtrip(bits):
    rng = np.random.default_rng(bits)
    S = 24
    codes = rng.integers(0, 1 << bits, size=(17, S), dtype=np.uint32)
    packed = bitpack.pack(jnp.asarray(codes), bits)
    assert packed.shape == (17, bitpack.packed_words(S, bits))
    out = bitpack.unpack(packed, bits, S)
    np.testing.assert_array_equal(np.asarray(out), codes.astype(np.int32))


def test_memory_parity():
    # 4-bit codes over 24 subspaces = 12 bytes/vector (not 24)
    assert bitpack.packed_bytes(24, 4) == 12
    assert bitpack.packed_bytes(24, 8) == 24
    # 1-bit over 96 dims = 12 bytes
    assert bitpack.packed_bytes(96, 1) == 12


def test_jit_and_word_layout():
    codes = jnp.array([[1, 2, 3, 4]], jnp.uint32)
    packed = jax.jit(lambda c: bitpack.pack(c, 8))(codes)
    # little-endian: 0x04030201
    assert int(packed[0, 0]) == 0x04030201
    out = jax.jit(lambda p: bitpack.unpack(p, 8, 4))(packed)
    np.testing.assert_array_equal(np.asarray(out), [[1, 2, 3, 4]])


def test_straddle_words():
    # 5-bit codes: code 6 occupies bits 30..35 (straddles word 0/1)
    codes = jnp.asarray(np.arange(13, dtype=np.uint32)[None, :] % 32)
    packed = bitpack.pack(codes, 5)
    out = bitpack.unpack(packed, 5, 13)
    np.testing.assert_array_equal(np.asarray(out)[0], np.arange(13) % 32)
