from cuvs_tpu.preprocessing import pca, quantize

__all__ = ["pca", "quantize"]
