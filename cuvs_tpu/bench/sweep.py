"""In-memory hyper-parameter sweep: grid + constraint pruning + Pareto.

The YAML/registry path (`cuvs_tpu.bench.runner.run_config`) mirrors the
reference's cuvs_bench orchestration; this module is the notebook/HPO
ergonomic layer on top of the same machinery for datasets that are
already in memory (the reference's analog workflow is Optuna over
cuvs_bench configs, notebooks/cuvs_hpo_example.ipynb).
"""

from __future__ import annotations

import itertools
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np


def _expand(grid: Dict[str, Sequence]) -> List[Dict]:
    if not grid:
        return [{}]
    keys = sorted(grid)
    return [dict(zip(keys, v)) for v in itertools.product(*(grid[k] for k in keys))]


def run_sweep(
    dataset,
    queries,
    k: int,
    space: Dict[str, Any],
    metric: str = "sqeuclidean",
    reps: int = 3,
    gt_queries: int = 512,
) -> List[Dict[str, Any]]:
    """Sweep build x search grids for one algo over in-memory arrays.

    ``space`` keys: ``algo`` (module name under cuvs_tpu.neighbors),
    ``build`` / ``search`` (param-name -> list of values), optional
    ``constraint`` (callable(build_params, search_params) -> bool, the
    reference's per-combo constraint hook). Returns one dict per
    surviving combo: {build, search, recall, qps, latency_ms, build_s},
    sorted by recall descending.
    """
    import importlib

    import jax

    module = importlib.import_module(f"cuvs_tpu.neighbors.{space['algo']}")
    constraint: Optional[Callable] = space.get("constraint")

    from cuvs_tpu.neighbors import brute_force

    nq = min(int(gt_queries), queries.shape[0])
    bf = brute_force.build(dataset, metric=metric)
    _, gti = brute_force.search(bf, queries[:nq], k)
    gti = np.asarray(gti)
    del bf

    rows: List[Dict[str, Any]] = []
    for bp in _expand(space.get("build", {})):
        index = None
        for sp in _expand(space.get("search", {})):
            if constraint is not None and not constraint(bp, sp):
                continue
            if index is None:  # build lazily: a fully-pruned bp never builds
                t0 = time.time()
                index = module.build(dataset, metric=metric, **bp)
                jax.block_until_ready(jax.tree.leaves(index)[0])
                build_s = time.time() - t0
            d, i = module.search(index, queries, k, **sp)
            jax.block_until_ready(i)
            rec = float(np.mean([
                len(set(a.tolist()) & set(b.tolist())) / k
                for a, b in zip(np.asarray(i)[:nq], gti)
            ]))
            t0 = time.time()
            for _ in range(reps):
                out = module.search(index, queries, k, **sp)
            jax.block_until_ready(out[1])
            dt = (time.time() - t0) / reps
            rows.append({
                "build": bp, "search": sp, "recall": round(rec, 4),
                "qps": round(queries.shape[0] / dt, 1),
                "latency_ms": round(dt * 1000, 3),
                "build_s": round(build_s, 3),
            })
    rows.sort(key=lambda r: -r["recall"])
    return rows


def pareto_frontier(rows: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Recall/QPS-dominant subset, recall-ascending (data_export.py's
    frontier semantics)."""
    best: List[Dict[str, Any]] = []
    for r in sorted(rows, key=lambda r: (-r["recall"], -r["qps"])):
        if not best or r["qps"] > best[-1]["qps"]:
            best.append(r)
    return list(reversed(best))
