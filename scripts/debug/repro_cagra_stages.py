"""Bisect the round-4 on-chip CAGRA fault, stage by stage.

Usage: python /tmp/repro_cagra.py <n_rows> <stage>
stages: knn (graph build substrate), opt (graph optimize), pack, search
Each stage block_until_ready()s so the fault is attributed correctly.
"""
import os
import sys
import time

import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
stage = sys.argv[2] if len(sys.argv) > 2 else "search"

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from cuvs_tpu.bench import datasets

ds = datasets.load("sift-128-euclidean", max_rows=n)
x = jax.device_put(ds.base)
q = jax.device_put(ds.queries[:1024].astype(np.float32))
print(f"# n={n} stage={stage}", flush=True)

from cuvs_tpu.neighbors import cagra, knn_graph, graph_core

t0 = time.time()
neighbors, dists = knn_graph.build_knn_graph(
    x, min(128, n - 1), metric="sqeuclidean", algo="auto",
    compute_dtype=jnp.bfloat16, recall_target=0.97, seed=0,
)
jax.block_until_ready(neighbors)
print(f"# knn_graph ok: {time.time()-t0:.1f}s shape={neighbors.shape}", flush=True)
if stage == "knn":
    sys.exit(0)

t0 = time.time()
graph = graph_core.optimize(neighbors, 64)
jax.block_until_ready(graph)
print(f"# optimize ok: {time.time()-t0:.1f}s shape={graph.shape}", flush=True)
del neighbors, dists
if stage == "opt":
    sys.exit(0)

index = cagra.from_graph(x, graph, metric="sqeuclidean")
t0 = time.time()
packed = cagra.pack(index)
jax.block_until_ready(packed.child_vecs)
print(f"# pack ok: {time.time()-t0:.1f}s", flush=True)
if stage == "pack":
    sys.exit(0)

for itopk, width in ((64, 2), (128, 2)):
    t0 = time.time()
    d, i = cagra.search(packed, q, 10, itopk_size=itopk, search_width=width,
                        query_chunk=1024, compute_dtype=jnp.bfloat16)
    jax.block_until_ready(d)
    print(f"# packed search itopk={itopk} ok: {time.time()-t0:.1f}s", flush=True)
print("# ALL OK", flush=True)
