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
           ann_kw: Optional[dict] = None,
           **kw) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fan out to both tiers, merge top-k (tiered_index.cuh:155-183).

    Extra keyword args are forwarded to the ANN tier's search (same
    convention as the upstream modules), merged over ``ann_kw``.
    """
    ann_kw = {**(ann_kw or {}), **kw}
    parts_d, parts_i = [], []
    select_min = is_min_close(t.metric)
    if t.ann_index is not None:
        d, i = t.module.search(t.ann_index, queries, k, prefilter=prefilter,
                               **ann_kw)
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


_MODULES = ("cagra", "ivf_flat", "ivf_pq", "ivf_sq", "ivf_rabitq", "brute_force")


def _params_to_json(p):
    """Best-effort JSON encoding of an IndexParams dataclass (enums -> int,
    dtypes -> name, non-encodable fields dropped)."""
    import dataclasses as dc
    import numpy as np

    if p is None or not dc.is_dataclass(p):
        return None
    out = {}
    for f in dc.fields(p):
        v = getattr(p, f.name)
        if hasattr(v, "value") and isinstance(getattr(v, "value"), int):
            v = int(v)
        elif v is not None and not isinstance(v, (int, float, str, bool)):
            try:
                v = np.dtype(v).name
            except TypeError:
                continue
        out[f.name] = v
    return out


def save(path: str, t: TieredIndex) -> None:
    """Serialize the tiered state: ANN sub-index + hot-tier rows + header
    (reference serializes the same state machine, tiered_index.cuh:109)."""
    import json
    import os

    import numpy as np

    from cuvs_tpu.utils import serialize as ser

    os.makedirs(path, exist_ok=True)
    header = {
        "magic": "cuvs_tpu.tiered_index",
        "version": 1,
        "module": t.module.__name__.rsplit(".", 1)[-1],
        "min_ann_rows": int(t.min_ann_rows),
        "metric": t.metric,
        "ann_rows": int(t.ann_rows),
        "has_ann": t.ann_index is not None,
        "has_bf": t.bf_data is not None and t.bf_data.shape[0] > 0,
        "ann_params": _params_to_json(t.ann_params),
    }
    with open(os.path.join(path, "tiered_header.json"), "w") as f:
        json.dump(header, f)
    if header["has_ann"]:
        ser.save(os.path.join(path, "ann.npz"), t.ann_index)
    if header["has_bf"]:
        np.save(os.path.join(path, "bf_data.npy"), np.asarray(t.bf_data))


def load(path: str) -> TieredIndex:
    """Deserialize a tiered index saved by :func:`save`."""
    import importlib
    import json
    import os

    import numpy as np

    from cuvs_tpu.utils import serialize as ser

    with open(os.path.join(path, "tiered_header.json")) as f:
        header = json.load(f)
    if header.get("magic") != "cuvs_tpu.tiered_index":
        raise ValueError("not a cuvs_tpu tiered index directory")
    if header.get("version", -1) > 1:
        raise ValueError("tiered index version too new")
    mod_name = header["module"]
    if mod_name not in _MODULES:
        raise ValueError(f"unknown ANN module {mod_name!r}")
    module = importlib.import_module(f"cuvs_tpu.neighbors.{mod_name}")
    ann_params = None
    if header.get("ann_params") is not None and hasattr(module, "IndexParams"):
        try:
            ann_params = module.IndexParams(**header["ann_params"])
        except TypeError:
            ann_params = None
    t = TieredIndex(
        module=module,
        ann_params=ann_params,
        min_ann_rows=header["min_ann_rows"],
        metric=header["metric"],
        ann_rows=header["ann_rows"],
    )
    if header["has_ann"]:
        t.ann_index = ser.load(os.path.join(path, "ann.npz"))
    if header["has_bf"]:
        t.bf_data = jnp.asarray(np.load(os.path.join(path, "bf_data.npy")))
    return t
