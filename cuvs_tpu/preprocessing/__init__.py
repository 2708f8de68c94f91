from cuvs_tpu.preprocessing import pca, quantize, spectral

__all__ = ["pca", "quantize", "spectral"]
