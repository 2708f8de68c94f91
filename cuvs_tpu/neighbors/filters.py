"""Sample filters for prefiltered search.

Reference surface: ``cuvs::neighbors::filtering``
(/root/reference/cpp/include/cuvs/neighbors/common.hpp:500-660):
``none_sample_filter``, ``bitset_filter`` (one shared bit per dataset row),
``bitmap_filter`` (per-query bit per row), and a JIT-compiled UDF filter.

TPU-native: a filter is a small pytree carried into the jitted search
function. Bit tests are elementwise gathers+shifts that XLA fuses into the
distance epilogue. The UDF analog needs no JIT machinery at all — a user
jax-traceable ``fn(query_ids, sample_ids) -> bool`` is traced straight into
the search kernel.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.struct
import jax.numpy as jnp

from cuvs_tpu.core import bitset


@flax.struct.dataclass
class Prefilter:
    """A search prefilter. kind is static so jit specializes per filter type."""

    kind: str = flax.struct.field(pytree_node=False, default="none")
    bits: Optional[jnp.ndarray] = None
    fn: Optional[Callable] = flax.struct.field(pytree_node=False, default=None)

    @property
    def is_none(self) -> bool:
        return self.kind == "none"


def no_filter() -> Prefilter:
    return Prefilter(kind="none")


def bitset_filter(bits) -> Prefilter:
    """Shared filter: bit i set => dataset row i may be returned."""
    return Prefilter(kind="bitset", bits=jnp.asarray(bits, jnp.uint32))


def bitmap_filter(bits) -> Prefilter:
    """Per-query filter: bits [n_queries, ceil(n/32)]."""
    return Prefilter(kind="bitmap", bits=jnp.asarray(bits, jnp.uint32))


def udf_filter(fn: Callable) -> Prefilter:
    """UDF filter: fn(query_ids, sample_ids) -> bool mask (broadcastable).

    The reference compiles a CUDA source string at runtime via JIT-LTO
    (common.hpp:624-660); here the callable is traced into the jitted
    search directly.
    """
    return Prefilter(kind="udf", fn=fn)


def from_mask(mask) -> Prefilter:
    """Convenience: build a bitset/bitmap filter from a boolean mask."""
    mask = jnp.asarray(mask)
    if mask.ndim == 1:
        return bitset_filter(bitset.bitset_from_mask(mask))
    return bitmap_filter(bitset.bitmap_from_mask(mask))


def passes(flt: Prefilter, query_ids, sample_ids) -> Optional[jnp.ndarray]:
    """Boolean mask of samples passing the filter, or None for no filter.

    query_ids: int array broadcastable against sample_ids ([nq, 1] typical).
    sample_ids: global dataset row ids (any shape, typically [nq, cand] or
    [1, tile]).
    """
    if flt is None or flt.is_none:
        return None
    if flt.kind == "bitset":
        return bitset.bitset_test(flt.bits, sample_ids)
    if flt.kind == "bitmap":
        return bitset.bitmap_test(flt.bits, query_ids, sample_ids)
    if flt.kind == "udf":
        return jnp.asarray(flt.fn(query_ids, sample_ids), jnp.bool_)
    raise ValueError(f"unknown filter kind {flt.kind}")
