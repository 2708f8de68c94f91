from cuvs_tpu.neighbors import brute_force, filters

__all__ = ["brute_force", "filters"]
