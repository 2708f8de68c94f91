"""Bisect graph_core.optimize's sub-steps at scale on the real chip.

Usage: python _repro_opt.py <n_rows> [stage]
stages: detour, prune, reverse, merge (cumulative; default merge)
Caches the intermediate knn graph in /tmp/knn_<n>.npy.
"""
import os
import sys
import time

import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
stage = sys.argv[2] if len(sys.argv) > 2 else "merge"

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

cache = f"/tmp/knn_{n}.npy"
if os.path.exists(cache):
    knn = np.load(cache)
else:
    from cuvs_tpu.bench import datasets
    from cuvs_tpu.neighbors import knn_graph

    ds = datasets.load("sift-128-euclidean", max_rows=n)
    x = jax.device_put(ds.base)
    t0 = time.time()
    neighbors, _ = knn_graph.build_knn_graph(
        x, min(128, n - 1), metric="sqeuclidean", algo="auto",
        compute_dtype=jnp.bfloat16, recall_target=0.97, seed=0,
    )
    knn = np.asarray(neighbors)
    print(f"# knn_graph: {time.time()-t0:.1f}s", flush=True)
    np.save(cache, knn)
    del x, neighbors

from cuvs_tpu.neighbors import graph_core as gc

g = jax.device_put(jnp.asarray(knn, jnp.int32))
print(f"# n={n} K={g.shape[1]} stage={stage}", flush=True)

t0 = time.time()
counts = gc._detour_counts(g)
jax.block_until_ready(counts)
print(f"# detour ok: {time.time()-t0:.1f}s", flush=True)
if stage == "detour":
    sys.exit(0)

t0 = time.time()
fwd = gc._prune_by_detour(g, counts, 64)
jax.block_until_ready(fwd)
print(f"# prune ok: {time.time()-t0:.1f}s", flush=True)
del counts, g
if stage == "prune":
    sys.exit(0)

t0 = time.time()
rev, rev_valid = gc._reverse_graph(fwd, 64)
jax.block_until_ready(rev)
print(f"# reverse ok: {time.time()-t0:.1f}s", flush=True)
if stage == "reverse":
    sys.exit(0)

t0 = time.time()
graph = gc._merge_fwd_rev(fwd, rev, rev_valid, 64)
jax.block_until_ready(graph)
print(f"# merge ok: {time.time()-t0:.1f}s", flush=True)
print("# ALL OK", flush=True)
