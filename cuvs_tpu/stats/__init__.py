from cuvs_tpu.stats.scores import silhouette_score, trustworthiness_score

__all__ = ["silhouette_score", "trustworthiness_score"]
