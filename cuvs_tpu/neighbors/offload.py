"""Host-offloaded sharded index: serve datasets far larger than HBM.

Reference analog: the dataset-scale ladder of SURVEY.md §5 — the
reference handles "dataset >> GPU memory" with host/mmap datasets,
conservative IVF allocation, ACE disk builds, and SHARDED SNMG
(snmg.cuh:127-166, batched queries common.hpp:1003). On TPU the same
ladder is: shard over chips first (cuvs_tpu.mg), then THIS module —
per-shard sub-indexes whose arrays live in host RAM (or on disk via the
serializer) and stream through the chip one shard at a time at search.

HBM math for the DEEP-100M target (BASELINE config 5) on one v5e chip
(16 GB HBM): raw f32 vectors are 100M x 96 x 4 B = 38.4 GB (2.4x HBM);
IVF-PQ at pq_dim=48, 8-bit codes is 48 B/vec = 4.8 GB of codes + 0.8 GB
ids/norms — fits on-chip for code-only scans, but exact refine needs the
raw vectors, hence streaming: S shards of 100M/S rows each move
38.4/S GB per sweep. A v5p-8 slice (95 GB HBM/chip x 8) holds the whole
thing resident via mg sharding; this module is the single-chip fallback
and the out-of-core build path.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cuvs_tpu.distance.pairwise import DistanceType, is_min_close
from cuvs_tpu.selection.select_k import merge_parts

_ALGOS = ("brute_force", "ivf_flat", "ivf_pq", "ivf_sq", "ivf_rabitq", "cagra")


def _module(algo: str):
    import importlib

    if algo not in _ALGOS:
        raise ValueError(f"unknown algo {algo!r}")
    return importlib.import_module(f"cuvs_tpu.neighbors.{algo}")


@dataclasses.dataclass
class OffloadIndex:
    """Per-shard sub-indexes held as HOST numpy pytrees."""

    algo: str
    shards: List[Any]  # index pytrees with np.ndarray leaves
    row_offsets: List[int]
    n_rows: int
    metric: Any = DistanceType.L2Expanded

    @property
    def size(self) -> int:
        return self.n_rows


def _to_host(index) -> Any:
    return jax.tree.map(lambda a: np.asarray(a), index)


def _to_device(index) -> Any:
    return jax.tree.map(lambda a: jnp.asarray(a), index)


def build(
    dataset,
    algo: str = "ivf_pq",
    n_shards: int = 8,
    index_params=None,
    **build_kw,
) -> OffloadIndex:
    """Build shard-at-a-time: only one shard's rows + sub-index are ever
    device-resident. ``dataset`` is an array-like, or any reader exposing
    ``n_rows`` and ``read(start, count) -> np.ndarray`` (e.g.
    cuvs_tpu.io.BinDataset for out-of-core .fbin files)."""
    module = _module(algo)
    reader = dataset if hasattr(dataset, "read") and hasattr(dataset, "n_rows") else None
    n = int(dataset.n_rows if reader is not None else dataset.shape[0])
    block = -(-n // n_shards)
    shards, offsets = [], []
    for s in range(n_shards):
        lo = s * block
        hi = min(lo + block, n)
        if lo >= hi:
            break
        rows = reader.read(lo, hi - lo) if reader is not None else dataset[lo:hi]
        if index_params is not None:
            sub = module.build(rows, index_params)
        else:
            sub = module.build(rows, **build_kw)
        shards.append(_to_host(sub))
        offsets.append(lo)
        del sub, rows
    metric = getattr(shards[0], "metric", DistanceType.L2Expanded) if shards else (
        DistanceType.L2Expanded
    )
    return OffloadIndex(algo=algo, shards=shards, row_offsets=offsets,
                        n_rows=n, metric=metric)


def search(
    index: OffloadIndex,
    queries,
    k: int,
    **search_kw,
) -> Tuple[np.ndarray, np.ndarray]:
    """Stream shards through the device: upload shard i, search the whole
    query batch against it, merge partial top-k on host, release. Peak
    device memory = one shard + one batch of partials."""
    module = _module(index.algo)
    queries = jnp.asarray(queries)
    select_min = is_min_close(index.metric) if not callable(index.metric) else True
    parts_d, parts_i = [], []
    for sub_host, off in zip(index.shards, index.row_offsets):
        sub = _to_device(sub_host)
        d, i = module.search(sub, queries, min(k, sub.size), **search_kw)
        parts_d.append(np.asarray(d))
        parts_i.append(np.asarray(i) + off)
        del sub, d, i
    out_d, out_i = merge_parts(parts_d, parts_i, k, select_min=select_min)
    return np.asarray(out_d), np.asarray(out_i)


@dataclasses.dataclass
class HostRefinedIndex:
    """Device-resident quantized ANN index + HOST-resident raw vectors.

    The single-chip big-dataset serving shape (docs/scale.md): the chip
    holds only the quantized ranking index (e.g. a 100M int8/PQ IVF in
    ~5-13 GB), the raw f32 rows stay in host RAM (or on disk via a
    reader), and every search re-ranks its k*ratio candidates exactly
    through refine_host — only ~k*ratio rows per query ever cross the
    host->device link. Reference analog: snmg.cuh:127-166 composed with
    refine_host.hpp.
    """

    algo: str
    device_index: Any
    host_vectors: Any  # np.ndarray / np.memmap / reader with .read()
    metric: Any = DistanceType.L2Expanded


def build_host_refined(
    dataset,
    algo: str = "ivf_flat",
    index_params=None,
    **build_kw,
) -> HostRefinedIndex:
    """Build the quantized device index over ``dataset`` while keeping
    the raw rows host-side as the exact refine source. For datasets that
    exceed host-staging comfort use ivf_flat.build_streaming directly
    and wrap the result with HostRefinedIndex."""
    module = _module(algo)
    arr = dataset if hasattr(dataset, "read") else np.asarray(dataset)
    rows = arr.read(0, arr.n_rows) if hasattr(arr, "read") else arr
    if index_params is not None:
        sub = module.build(rows, index_params)
    else:
        sub = module.build(rows, **build_kw)
    return HostRefinedIndex(
        algo=algo, device_index=sub, host_vectors=arr,
        metric=getattr(sub, "metric", DistanceType.L2Expanded),
    )


def search_refined(
    index: HostRefinedIndex,
    queries,
    k: int,
    refine_ratio: int = 4,
    **search_kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantized device ranking -> exact host re-rank of k*refine_ratio
    candidates (refine_host semantics: only the candidate rows are
    gathered from host RAM and uploaded)."""
    from cuvs_tpu.neighbors import refine as refine_mod

    module = _module(index.algo)
    cand_k = max(k, k * refine_ratio)
    _, cand = module.search(index.device_index, queries, cand_k, **search_kw)
    return refine_mod.refine_host(
        index.host_vectors, np.asarray(queries), np.asarray(cand), k,
        metric=index.metric,
    )


def save(path: str, index: OffloadIndex) -> None:
    """One serialized sub-index per shard + a distribution header (the
    snmg.cuh:46-90 per-rank layout)."""
    from cuvs_tpu.utils import serialize as ser

    os.makedirs(path, exist_ok=True)
    header = {
        "magic": "cuvs_tpu.offload_index",
        "version": 1,
        "algo": index.algo,
        "n_rows": index.n_rows,
        "row_offsets": list(map(int, index.row_offsets)),
    }
    with open(os.path.join(path, "offload_header.json"), "w") as f:
        json.dump(header, f)
    for s, shard in enumerate(index.shards):
        ser.save(os.path.join(path, f"shard_{s}.npz"), shard)


def load(path: str, mmap: bool = True) -> OffloadIndex:
    """Load shard headers; arrays stay host-side (numpy)."""
    from cuvs_tpu.utils import serialize as ser

    with open(os.path.join(path, "offload_header.json")) as f:
        header = json.load(f)
    if header.get("magic") != "cuvs_tpu.offload_index":
        raise ValueError("not a cuvs_tpu offload index directory")
    if header.get("version", -1) > 1:
        raise ValueError("offload index version too new")
    shards = [
        _to_host(ser.load(os.path.join(path, f"shard_{s}.npz")))
        for s in range(len(header["row_offsets"]))
    ]
    metric = getattr(shards[0], "metric", DistanceType.L2Expanded)
    return OffloadIndex(
        algo=header["algo"], shards=shards,
        row_offsets=header["row_offsets"], n_rows=header["n_rows"],
        metric=metric,
    )
