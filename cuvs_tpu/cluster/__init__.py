from cuvs_tpu.cluster import agglomerative, kmeans, kmeans_balanced, spectral

__all__ = ["agglomerative", "kmeans", "kmeans_balanced", "spectral"]
