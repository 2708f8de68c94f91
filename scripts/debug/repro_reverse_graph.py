"""Probe _reverse_graph's failure envelope at 1M rows.

Usage: python _repro_rev.py <deg> <rev_degree> [n]
Uses the cached knn graph; fwd graph = prune to <deg>.
"""
import os
import sys
import time

import numpy as np

deg = int(sys.argv[1]) if len(sys.argv) > 1 else 64
rev_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 64
n = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

knn = np.load(f"/tmp/knn_{n}.npy")[:, :deg]
from cuvs_tpu.neighbors import graph_core as gc

fwd = jax.device_put(jnp.asarray(knn, jnp.int32))
print(f"# n={n} deg={deg} rev_degree={rev_deg}", flush=True)
t0 = time.time()
rev, valid = gc._reverse_graph(fwd, rev_deg)
jax.block_until_ready(rev)
print(f"# reverse ok: {time.time()-t0:.1f}s", flush=True)
