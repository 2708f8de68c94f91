from cuvs_tpu.distance.pairwise import (
    DistanceType,
    pairwise_distance,
    is_min_close,
    normalize_metric,
    row_norms,
)
from cuvs_tpu.distance.fused_l2_nn import fused_l2_argmin
from cuvs_tpu.distance import kernels

__all__ = [
    "DistanceType",
    "pairwise_distance",
    "is_min_close",
    "normalize_metric",
    "row_norms",
    "fused_l2_argmin",
    "kernels",
]
