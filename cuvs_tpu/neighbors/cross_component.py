"""Cross-component nearest neighbors (HDBSCAN/MST pipeline primitive).

Reference: ``cuvs::sparse::neighbors::cross_component_nn``
(/root/reference/cpp/src/sparse/neighbors/cross_component_nn.cuh:68):
for each connected component, find its nearest point in any OTHER
component — the edges that stitch an MST forest together.

TPU-native: per component, one exact MXU brute-force query of its rows
against the complement (components are few; the matmuls dominate).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from cuvs_tpu.neighbors import brute_force


def cross_component_nn(x, components, metric="sqeuclidean") -> np.ndarray:
    """Returns edges [n_components, 3]: (src_row, dst_row, distance) — the
    minimal outgoing edge per component (by component id order)."""
    x = np.asarray(x, np.float32)
    components = np.asarray(components)
    uniq = np.unique(components)
    edges = np.zeros((len(uniq), 3), np.float64)
    for ci, c in enumerate(uniq):
        inside = np.where(components == c)[0]
        outside = np.where(components != c)[0]
        if len(outside) == 0:
            edges[ci] = (inside[0], inside[0], np.inf)
            continue
        index = brute_force.build(x[outside], metric=metric)
        d, i = brute_force.search(index, x[inside], 1)
        d = np.asarray(d)[:, 0]
        best = int(np.argmin(d))
        edges[ci] = (inside[best], outside[np.asarray(i)[best, 0]], float(d[best]))
    return edges
