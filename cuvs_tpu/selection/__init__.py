from cuvs_tpu.selection.select_k import select_k, merge_parts

__all__ = ["select_k", "merge_parts"]
