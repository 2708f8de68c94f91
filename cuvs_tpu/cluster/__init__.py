from cuvs_tpu.cluster import kmeans, kmeans_balanced

__all__ = ["kmeans", "kmeans_balanced"]
