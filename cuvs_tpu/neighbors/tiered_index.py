"""Tiered index: brute-force hot tier + ANN cold tier.

Reference: ``cuvs::neighbors::tiered_index``
(/root/reference/cpp/include/cuvs/neighbors/tiered_index.hpp:62 —
min_ann_rows=100000; state machine cpp/src/neighbors/detail/
tiered_index.cuh:33-183). New rows land in an incremental brute-force
tier; once ``min_ann_rows`` accumulate, the ANN tier is (re)built; search
fans out to both tiers and merges; ``compact()`` folds the BF tier into
the ANN tier.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from cuvs_tpu.distance.pairwise import is_min_close
from cuvs_tpu.neighbors import brute_force
from cuvs_tpu.selection.select_k import merge_parts


@dataclasses.dataclass
class TieredIndex:
    module: object  # ANN module (cagra / ivf_flat / ivf_pq / ivf_sq)
    ann_params: object
    min_ann_rows: int = 100_000
    metric: str = "sqeuclidean"
    ann_index: Optional[object] = None
    ann_rows: int = 0
    bf_data: Optional[jnp.ndarray] = None  # hot-tier rows (ids follow ann)

    @property
    def size(self) -> int:
        return self.ann_rows + (0 if self.bf_data is None else self.bf_data.shape[0])


def build(module, dataset=None, ann_params=None, min_ann_rows: int = 100_000,
          metric: str = "sqeuclidean") -> TieredIndex:
    t = TieredIndex(module=module, ann_params=ann_params,
                    min_ann_rows=min_ann_rows, metric=metric)
    if dataset is not None:
        t = extend(t, dataset)
    return t


def _build_ann(t: TieredIndex, data) -> TieredIndex:
    if t.ann_params is not None:
        ann = t.module.build(data, t.ann_params)
    else:
        ann = t.module.build(data)
    t.ann_index = ann
    t.ann_rows = data.shape[0]
    t.bf_data = None
    return t


def extend(t: TieredIndex, new_rows) -> TieredIndex:
    """Append rows; promotes the BF tier to ANN when min_ann_rows reached."""
    new_rows = jnp.asarray(new_rows)
    bf = new_rows if t.bf_data is None else jnp.concatenate([t.bf_data, new_rows])
    t.bf_data = bf
    if t.ann_index is None and bf.shape[0] >= t.min_ann_rows:
        t = _build_ann(t, bf)
    return t


def compact(t: TieredIndex) -> TieredIndex:
    """Fold the hot tier into the ANN tier (tiered_index.cuh compact)."""
    if t.bf_data is None or t.bf_data.shape[0] == 0:
        return t
    if t.ann_index is None:
        return _build_ann(t, t.bf_data)
    if hasattr(t.module, "extend"):
        t.ann_index = t.module.extend(t.ann_index, t.bf_data)
        t.ann_rows += t.bf_data.shape[0]
        t.bf_data = None
        return t
    # module without extend (e.g. cagra pre-extend): full rebuild
    raise NotImplementedError("ANN module lacks extend(); rebuild manually")


def search(t: TieredIndex, queries, k: int, prefilter=None,
           ann_kw: Optional[dict] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fan out to both tiers, merge top-k (tiered_index.cuh:155-183)."""
    parts_d, parts_i = [], []
    select_min = is_min_close(t.metric)
    if t.ann_index is not None:
        d, i = t.module.search(t.ann_index, queries, k, prefilter=prefilter,
                               **(ann_kw or {}))
        parts_d.append(jnp.asarray(d))
        parts_i.append(jnp.asarray(i))
    if t.bf_data is not None and t.bf_data.shape[0] > 0:
        bf_index = brute_force.build(t.bf_data, metric=t.metric)
        kk = min(k, t.bf_data.shape[0])
        d, i = brute_force.search(bf_index, queries, kk, prefilter=None)
        parts_d.append(jnp.asarray(d))
        parts_i.append(jnp.asarray(i) + t.ann_rows)  # hot-tier ids follow ANN
    if not parts_d:
        raise ValueError("empty tiered index")
    if len(parts_d) == 1:
        return parts_d[0], parts_i[0]
    return merge_parts(parts_d, parts_i, k, select_min=select_min)
