"""cuvs_tpu — TPU-native vector search and clustering.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
rapidsai/cuvs (see SURVEY.md): exact and approximate nearest-neighbor
search, clustering, pairwise distances, batched top-k selection,
quantization, filtered search, and multi-chip sharded/replicated
indexes over a `jax.sharding.Mesh`.

Layout mirrors the reference's public API families
(/root/reference/cpp/include/cuvs/) while the implementation is
idiomatic JAX: MXU-tiled distance matmuls, tiled exact top-k,
jitted beam search, and shard_map collectives instead of NCCL.
"""

__version__ = "0.1.0"

from cuvs_tpu import core, distance, selection, cluster, neighbors, preprocessing, stats

__all__ = [
    "core",
    "distance",
    "selection",
    "cluster",
    "neighbors",
    "preprocessing",
    "stats",
    "__version__",
]
