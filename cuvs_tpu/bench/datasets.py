"""Benchmark datasets: registry, loading, ground-truth generation.

Reference: python/cuvs_bench dataset machinery
(/root/reference/python/cuvs_bench/cuvs_bench/config/datasets/datasets.yaml,
get_dataset, generate_groundtruth/__main__.py — GPU exact k-NN GT).

Real datasets load from ``$CUVS_TPU_DATASET_DIR/<name>/base.fbin`` (+
``query.fbin``) in big-ann .bin format; when absent (this environment has
zero egress), seeded synthetic datasets with the standard shapes stand in
so sweeps stay comparable run to run.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import numpy as np

# name -> (n_base, dim, n_query, metric)  [standard dataset shapes]
REGISTRY = {
    "sift-128-euclidean": (1_000_000, 128, 10_000, "sqeuclidean"),
    "gist-960-euclidean": (1_000_000, 960, 1_000, "sqeuclidean"),
    "glove-100-inner": (1_183_514, 100, 10_000, "inner_product"),
    "deep-image-96-inner": (9_990_000, 96, 10_000, "inner_product"),
    "mnist-784-euclidean": (60_000, 784, 10_000, "sqeuclidean"),
    "synthetic-100k-96": (100_000, 96, 10_000, "sqeuclidean"),
    "synthetic-1m-96": (1_000_000, 96, 10_000, "sqeuclidean"),
    "synthetic-10m-96": (10_000_000, 96, 10_000, "sqeuclidean"),
}


@dataclasses.dataclass
class Dataset:
    name: str
    base: np.ndarray
    queries: np.ndarray
    metric: str
    synthetic: bool


def dataset_dir() -> Optional[str]:
    return os.environ.get("CUVS_TPU_DATASET_DIR")


def load(name: str, max_rows: Optional[int] = None, seed: int = 0) -> Dataset:
    if name not in REGISTRY:
        raise ValueError(f"unknown dataset {name!r}; known: {sorted(REGISTRY)}")
    n, dim, nq, metric = REGISTRY[name]
    if max_rows:
        n = min(n, max_rows)
    root = dataset_dir()
    if root:
        base_path = os.path.join(root, name, "base.fbin")
        query_path = os.path.join(root, name, "query.fbin")
        if os.path.exists(base_path):
            from cuvs_tpu import io as cio

            with cio.BinDataset(base_path) as d:
                base = d.read(0, min(n, d.n_rows))
            queries = (
                cio.load_bin(query_path)
                if os.path.exists(query_path)
                else base[:nq].copy()
            )
            return Dataset(name, base, queries[:nq], metric, synthetic=False)
    # synthetic stand-in with realistic structure: embedding-like data has
    # low intrinsic dimension (~dim/4), which is what makes ANN work; pure
    # iid gaussians are the degenerate worst case and would make recall
    # numbers meaningless
    rng = np.random.default_rng(seed)
    r = max(8, dim // 4)
    proj = rng.standard_normal((r, dim)).astype(np.float32) / np.sqrt(r)
    base = rng.standard_normal((n, r), dtype=np.float32) @ proj
    base += 0.05 * rng.standard_normal((n, dim), dtype=np.float32)
    queries = rng.standard_normal((nq, r), dtype=np.float32) @ proj
    queries += 0.05 * rng.standard_normal((nq, dim), dtype=np.float32)
    return Dataset(name, base, queries, metric, synthetic=True)


def groundtruth(ds: Dataset, k: int = 100, gt_queries: int = 1024,
                cache_dir: Optional[str] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Exact k-NN ground truth on-device (generate_groundtruth analog)."""
    cache = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        cache = os.path.join(
            cache_dir, f"{ds.name}-n{ds.base.shape[0]}-q{gt_queries}-k{k}.npz"
        )
        if os.path.exists(cache):
            z = np.load(cache)
            return z["dists"], z["ids"]
    from cuvs_tpu.neighbors import brute_force

    index = brute_force.build(ds.base, metric=ds.metric)
    d, i = brute_force.search(index, ds.queries[:gt_queries], k)
    d, i = np.asarray(d), np.asarray(i)
    if cache:
        np.savez(cache, dists=d, ids=i)
    return d, i
