from cuvs_tpu.neighbors import (
    brute_force,
    cagra,
    filters,
    graph_core,
    ivf_flat,
    ivf_pq,
    knn_graph,
    refine,
)
from cuvs_tpu.neighbors.refine import refine as refine_fn  # noqa: F401

__all__ = [
    "brute_force",
    "cagra",
    "filters",
    "graph_core",
    "ivf_flat",
    "ivf_pq",
    "knn_graph",
    "refine",
]
