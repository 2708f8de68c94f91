"""Benchmark runner: build/search sweeps with recall/QPS/latency rows.

Reference: the cuvs_bench harness
(/root/reference/cpp/bench/ann/src/common/benchmark.hpp:337-413 metrics;
python orchestration python/cuvs_bench/cuvs_bench/run/). Metrics match:
QPS = items_per_second over the timed search loop, latency = avg
per-batch seconds, recall vs ground truth, end_to_end = wall build time.
Output rows mirror data_export.py's CSV columns.
"""

from __future__ import annotations

import dataclasses
import itertools
import json
import time
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from cuvs_tpu.bench import datasets as ds_mod


@dataclasses.dataclass
class Row:
    algo: str
    dataset: str
    build_s: float
    params: Dict[str, Any]
    recall: float
    qps: float
    latency_ms: float

    def as_dict(self):
        d = dataclasses.asdict(self)
        d["params"] = json.dumps(self.params, default=str)
        return d


def _recall(found, gt, k):
    return float(np.mean([
        len(set(a[:k].tolist()) & set(b[:k].tolist())) / k for a, b in zip(found, gt)
    ]))


# algo name -> (build_fn(build_params) -> index,
#               search_fn(index, queries, k, search_params) -> (d, i)),
# closed over the dataset so refine_ratio can re-rank against ds.base.
def _algo_table(ds):
    from cuvs_tpu.neighbors import (
        brute_force, cagra, ivf_flat, ivf_pq, ivf_rabitq, ivf_sq, refine,
    )

    def ivf_pq_search(ix, q, k, p):
        p = dict(p)
        ratio = float(p.pop("refine_ratio", 1.0))
        if ratio > 1.0:
            _, cand = ivf_pq.search(ix, q, int(k * ratio), **p)
            return refine.refine(ds.base, q, cand, k, metric=ds.metric)
        return ivf_pq.search(ix, q, k, **p)

    def rabitq_search(ix, q, k, p):
        p = dict(p)
        ratio = float(p.pop("refine_ratio", 1.0))
        if ratio > 1.0:
            _, cand = ivf_rabitq.search(ix, q, int(k * ratio), **p)
            return refine.refine(ds.base, q, cand, k, metric=ds.metric)
        return ivf_rabitq.search(ix, q, k, **p)

    return {
        "brute_force": (
            lambda p: brute_force.build(ds.base, metric=ds.metric),
            lambda ix, q, k, p: brute_force.search(
                ix, q, k, **{k_: v for k_, v in p.items() if v is not None}),
        ),
        "ivf_flat": (
            lambda p: ivf_flat.build(ds.base, metric=ds.metric, **p),
            lambda ix, q, k, p: ivf_flat.search(ix, q, k, **p),
        ),
        "ivf_pq": (
            lambda p: ivf_pq.build(ds.base, metric=ds.metric, **p),
            ivf_pq_search,
        ),
        "ivf_sq": (
            lambda p: ivf_sq.build(ds.base, metric=ds.metric, **p),
            lambda ix, q, k, p: ivf_sq.search(ix, q, k, **p),
        ),
        "ivf_rabitq": (
            lambda p: ivf_rabitq.build(ds.base, metric=ds.metric, **p),
            rabitq_search,
        ),
        "cagra": (
            lambda p: cagra.build(ds.base, metric=ds.metric, **p),
            lambda ix, q, k, p: cagra.search(ix, q, k, **p),
        ),
        # competitor row (reference: cpp/bench/ann/src/hnswlib/) — CPU
        # single-thread HNSW, independent implementation
        # (native/hnsw_baseline.cpp; hnswlib is not vendorable offline)
        "hnsw_cpu": (
            lambda p: __import__(
                "cuvs_tpu.bench.competitors", fromlist=["HnswCpu"]
            ).HnswCpu(metric=ds.metric, **p).build(np.asarray(ds.base, np.float32)),
            lambda ix, q, k, p: ix.search(np.asarray(q, np.float32), k, **p),
        ),
    }


def _expand_grid(grid: Dict[str, Sequence]) -> List[Dict]:
    if not grid:
        return [{}]
    keys = sorted(grid)
    return [dict(zip(keys, vals)) for vals in itertools.product(*(grid[k] for k in keys))]


def run(
    dataset: str,
    algo: str,
    build_params: Optional[Dict] = None,
    search_grid: Optional[Dict[str, Sequence]] = None,
    k: int = 10,
    max_rows: Optional[int] = None,
    gt_queries: int = 1024,
    reps: int = 3,
    cache_dir: Optional[str] = None,
) -> List[Row]:
    """Build once, sweep search params, return one Row per combination."""
    import jax

    ds = ds_mod.load(dataset, max_rows=max_rows)
    table = _algo_table(ds)
    if algo not in table:
        raise ValueError(f"unknown algo {algo!r}; known: {sorted(table)}")
    build_fn, search_fn = table[algo]

    gtd, gti = ds_mod.groundtruth(ds, k=k, gt_queries=gt_queries, cache_dir=cache_dir)

    t0 = time.time()
    index = build_fn(build_params or {})
    jax.block_until_ready(jax.tree.leaves(index)[0] if jax.tree.leaves(index) else None)
    build_s = time.time() - t0

    rows = []
    q = ds.queries
    for sp in _expand_grid(search_grid or {}):
        d, i = search_fn(index, q, k, sp)
        jax.block_until_ready(i)
        rec = _recall(np.asarray(i)[:gt_queries], gti, k)
        t0 = time.time()
        for _ in range(reps):
            out = search_fn(index, q, k, sp)
        jax.block_until_ready(out[1])
        dt = (time.time() - t0) / reps
        rows.append(
            Row(
                algo=algo,
                dataset=ds.name,
                build_s=round(build_s, 3),
                params=sp,
                recall=round(rec, 4),
                qps=round(q.shape[0] / dt, 1),
                latency_ms=round(dt * 1000, 3),
            )
        )
    return rows


def load_config(name_or_path: str) -> Dict:
    """Load a YAML sweep config (reference config/algos/*.yaml layout:
    name, optional constraints.{build,search} dotted names, groups of
    build/search grids). Bare names resolve to the bundled configs/."""
    import os

    import yaml

    path = name_or_path
    if not os.path.exists(path):
        path = os.path.join(os.path.dirname(__file__), "configs", f"{name_or_path}.yaml")
    with open(path) as f:
        cfg = yaml.safe_load(f)
    if "name" not in cfg or "groups" not in cfg:
        raise ValueError(f"config {name_or_path!r} needs 'name' and 'groups'")
    return cfg


def run_config(
    config: str,
    dataset: str,
    group: str = "base",
    k: int = 10,
    max_rows: Optional[int] = None,
    gt_queries: int = 1024,
    reps: int = 3,
    cache_dir: Optional[str] = None,
) -> List[Row]:
    """Run a full YAML sweep: every valid build combo x search combo
    (constraint hooks drop invalid pairs, mirroring cuvs_bench's
    config/algos/constraints)."""
    from cuvs_tpu.bench import constraints as cons

    cfg = load_config(config)
    algo = cfg["name"]
    grp = cfg["groups"][group]
    hooks = cfg.get("constraints", {})
    build_ok = cons.resolve(hooks["build"]) if "build" in hooks else None
    search_ok = cons.resolve(hooks["search"]) if "search" in hooks else None

    ds = ds_mod.load(dataset, max_rows=max_rows)
    dims = ds.base.shape[1]
    batch = ds.queries.shape[0]
    rows: List[Row] = []
    for bp in _expand_grid(grp.get("build") or {}):
        if build_ok is not None and not build_ok(bp, dims):
            continue
        sgrid = grp.get("search") or {}
        combos = [
            sp for sp in _expand_grid(sgrid)
            if search_ok is None or search_ok(sp, bp, k, batch)
        ]
        if not combos:
            continue
        # build once, then time each valid search combo
        import jax
        import time as _time

        table = _algo_table(ds)
        build_fn, search_fn = table[algo]
        gtd, gti = ds_mod.groundtruth(ds, k=k, gt_queries=gt_queries, cache_dir=cache_dir)
        t0 = _time.time()
        index = build_fn(bp)
        leaves = jax.tree.leaves(index)
        jax.block_until_ready(leaves[0] if leaves else None)
        build_s = _time.time() - t0
        for sp in combos:
            d, i = search_fn(index, ds.queries, k, sp)
            jax.block_until_ready(i)
            rec = _recall(np.asarray(i)[:gt_queries], gti, k)
            t0 = _time.time()
            for _ in range(reps):
                out = search_fn(index, ds.queries, k, sp)
            jax.block_until_ready(out[1])
            dt = (_time.time() - t0) / reps
            rows.append(Row(
                algo=algo, dataset=ds.name, build_s=round(build_s, 3),
                params={"build": bp, "search": sp},
                recall=round(rec, 4),
                qps=round(ds.queries.shape[0] / dt, 1),
                latency_ms=round(dt * 1000, 3),
            ))
    return rows


def pareto(rows: List[Row]) -> List[Row]:
    """Recall/QPS Pareto frontier (cuvs_bench plot's frontier logic)."""
    best: List[Row] = []
    for r in sorted(rows, key=lambda r: (-r.recall, -r.qps)):
        if not best or r.qps > best[-1].qps:
            best.append(r)
    return best


def write_csv(rows: List[Row], path: str) -> None:
    import csv

    with open(path, "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["algo", "dataset", "build_s", "params", "recall", "qps", "latency_ms"]
        )
        w.writeheader()
        for r in rows:
            w.writerow(r.as_dict())
