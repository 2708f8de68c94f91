"""Composite index: logical union of child indexes.

Reference: ``cuvs::neighbors::composite::index``
(/root/reference/cpp/include/cuvs/neighbors/composite/index.hpp:69;
cpp/src/neighbors/composite/index.cu): search every child, merge top-k.
Created by LOGICAL merge (MergeStrategy, common.hpp:129-133).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp

from cuvs_tpu.selection.select_k import merge_parts
from cuvs_tpu.distance.pairwise import is_min_close


class CompositeIndex:
    """Children are (module, index, id_offset) triples.

    ``id_offset`` shifts child-local ids into the composite id space
    (children built on disjoint dataset slices pass their slice start;
    children with already-global ids pass 0).
    """

    def __init__(self, children: Sequence[Tuple[object, object, int]]):
        if not children:
            raise ValueError("composite index needs at least one child")
        self.children = list(children)

    @property
    def size(self) -> int:
        return sum(ix.size for _, ix, _ in self.children)

    def search(self, queries, k: int, prefilter=None, **kw):
        parts_d, parts_i = [], []
        metric = getattr(self.children[0][1], "metric", None)
        for module, ix, off in self.children:
            d, i = module.search(ix, queries, k, prefilter=prefilter, **kw)
            parts_d.append(jnp.asarray(d))
            parts_i.append(jnp.asarray(i) + off)
        select_min = is_min_close(metric) if metric is not None else True
        return merge_parts(parts_d, parts_i, k, select_min=select_min)


def merge(module, indexes: Sequence[object], datasets=None, strategy: str = "logical",
          id_offsets: Optional[Sequence[int]] = None, build_params=None, **kw):
    """Merge indexes (cagra.hpp:2477-2501 MergeStrategy semantics).

    LOGICAL -> CompositeIndex view. PHYSICAL -> rebuild one index over the
    concatenated datasets (requires ``datasets``).
    """
    if strategy == "logical":
        if id_offsets is None:
            offs = []
            acc = 0
            for ix in indexes:
                offs.append(acc)
                acc += ix.size
        else:
            offs = list(id_offsets)
        return CompositeIndex([(module, ix, off) for ix, off in zip(indexes, offs)])
    if strategy == "physical":
        if datasets is None:
            raise ValueError("physical merge needs the datasets")
        data = jnp.concatenate([jnp.asarray(d) for d in datasets], axis=0)
        if build_params is not None:
            return module.build(data, build_params)
        return module.build(data, **kw)
    raise ValueError(f"unknown merge strategy {strategy!r}")
