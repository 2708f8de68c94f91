from cuvs_tpu.core.bitset import (
    bitset_create,
    bitset_from_mask,
    bitset_set,
    bitset_test,
    bitset_to_mask,
    bitmap_from_mask,
    bitmap_test,
)
from cuvs_tpu.core.resources import Resources

__all__ = [
    "Resources",
    "bitset_create",
    "bitset_from_mask",
    "bitset_set",
    "bitset_test",
    "bitset_to_mask",
    "bitmap_from_mask",
    "bitmap_test",
]
