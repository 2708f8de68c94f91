"""Force fresh compiles (odd n) of the optimize chain; retry on fault.

Tests (a) whether the device fault correlates with fresh compiles and
(b) whether an in-process retry recovers after a fault.
"""
import os
import sys
import time

import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 999_001

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

knn = np.load("/tmp/knn_1000000.npy")[:n]
from cuvs_tpu.neighbors import graph_core as gc

g = jax.device_put(jnp.asarray(knn, jnp.int32))
knn = None
print(f"# n={n} K={g.shape[1]}", flush=True)

for attempt in range(3):
    try:
        t0 = time.time()
        graph = gc.optimize(g, 64)
        jax.block_until_ready(graph)
        print(f"# optimize ok (attempt {attempt}): {time.time()-t0:.1f}s",
              flush=True)
        break
    except Exception as e:  # noqa: BLE001
        print(f"# attempt {attempt} FAULTED after {time.time()-t0:.1f}s: "
              f"{type(e).__name__}: {e}", flush=True)
        time.sleep(5)
