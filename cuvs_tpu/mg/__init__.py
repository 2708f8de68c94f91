from cuvs_tpu.mg.snmg import MGIndex, build, search, default_mesh
from cuvs_tpu.mg.kmeans_mg import fit as kmeans_fit

__all__ = ["MGIndex", "build", "search", "default_mesh", "kmeans_fit"]
