from cuvs_tpu.mg.snmg import (
    MGIndex, build, build_streaming, search, default_mesh,
)
from cuvs_tpu.mg.kmeans_mg import fit as kmeans_fit

__all__ = [
    "MGIndex", "build", "build_streaming", "search", "default_mesh",
    "kmeans_fit",
]
