from cuvs_tpu.ops import bf_topk_pallas
__all__ = ["bf_topk_pallas"]
