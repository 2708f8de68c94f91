"""Sparse (CSR) exact k-NN.

Reference: ``cuvs::neighbors::brute_force`` sparse_index
(/root/reference/cpp/include/cuvs/neighbors/brute_force.hpp:603-693,
batched with batch_size_{index,query}=2^15; impl
cpp/src/neighbors/detail/sparse_knn.cuh over semiring sparse distances,
cpp/src/distance/sparse_distance.cu).

TPU-native: there is no cuSPARSE analog, and the MXU only eats dense
tiles — so the design is **block densification**: stream [query_block x
feature_tile] and [index_block x feature_tile] dense tiles scattered from
CSR on host, accumulate dot products with dense MXU matmuls, and apply
the metric epilogue from precomputed sparse norms. For realistic ANN
sparsity (TF-IDF etc.) the densified tiles are small compared to the
matmul throughput they unlock.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from cuvs_tpu.distance.pairwise import DistanceType, normalize_metric, matmul_precision
from jax import lax


@dataclasses.dataclass
class SparseIndex:
    indptr: np.ndarray  # [n+1]
    indices: np.ndarray  # [nnz]
    data: np.ndarray  # [nnz]
    n_cols: int
    norms: np.ndarray  # [n] squared L2
    metric: DistanceType = DistanceType.L2Expanded

    @property
    def size(self):
        return self.indptr.shape[0] - 1


def build(indptr, indices, data, n_cols: int, metric="sqeuclidean") -> SparseIndex:
    metric = normalize_metric(metric)
    if metric not in (DistanceType.L2Expanded, DistanceType.L2SqrtExpanded,
                      DistanceType.InnerProduct, DistanceType.CosineExpanded):
        raise ValueError(f"sparse knn supports L2/IP/cosine, got {metric}")
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int32)
    data = np.asarray(data, np.float32)
    norms = np.zeros(indptr.shape[0] - 1, np.float32)
    np.add.at(norms, np.repeat(np.arange(len(norms)), np.diff(indptr)), data**2)
    return SparseIndex(indptr, indices, data, n_cols, norms, metric)


def from_scipy(csr, metric="sqeuclidean") -> SparseIndex:
    return build(csr.indptr, csr.indices, csr.data, csr.shape[1], metric)


def _densify(indptr, indices, data, rows, col_lo, col_hi):
    """Rows x [col_lo, col_hi) dense block from CSR (host-side scatter)."""
    out = np.zeros((len(rows), col_hi - col_lo), np.float32)
    for i, r in enumerate(rows):
        s, e = indptr[r], indptr[r + 1]
        cols = indices[s:e]
        m = (cols >= col_lo) & (cols < col_hi)
        out[i, cols[m] - col_lo] = data[s:e][m]
    return out


def search(
    index: SparseIndex,
    q_indptr,
    q_indices,
    q_data,
    k: int,
    query_block: int = 4096,
    index_block: int = 32768,
    feature_tile: int = 8192,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact sparse k-NN. Query CSR against the index. Returns (d, ids)."""
    q_indptr = np.asarray(q_indptr, np.int64)
    q_indices = np.asarray(q_indices, np.int32)
    q_data = np.asarray(q_data, np.float32)
    nq = q_indptr.shape[0] - 1
    n = index.size
    metric = index.metric
    ip = metric == DistanceType.InnerProduct

    qn = np.zeros(nq, np.float32)
    np.add.at(qn, np.repeat(np.arange(nq), np.diff(q_indptr)), q_data**2)

    out_d = np.empty((nq, k), np.float32)
    out_i = np.empty((nq, k), np.int64)
    f_tiles = range(0, index.n_cols, feature_tile)

    for qs in range(0, nq, query_block):
        qrows = np.arange(qs, min(qs + query_block, nq))
        best_d = np.full((len(qrows), 0), np.inf, np.float32)
        best_i = np.zeros((len(qrows), 0), np.int64)
        for xs in range(0, n, index_block):
            xrows = np.arange(xs, min(xs + index_block, n))
            dots = jnp.zeros((len(qrows), len(xrows)), jnp.float32)
            for lo in f_tiles:
                hi = min(lo + feature_tile, index.n_cols)
                qd = _densify(q_indptr, q_indices, q_data, qrows, lo, hi)
                xd = _densify(index.indptr, index.indices, index.data, xrows, lo, hi)
                if not qd.any() or not xd.any():
                    continue
                dots = dots + lax.dot_general(
                    jnp.asarray(qd), jnp.asarray(xd), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=matmul_precision(jnp.float32),
                )
            dots = np.asarray(dots)
            if ip:
                dist = -dots
            elif metric == DistanceType.CosineExpanded:
                denom = np.maximum(
                    np.sqrt(qn[qrows])[:, None] * np.sqrt(index.norms[xrows])[None, :],
                    1e-30,
                )
                dist = 1.0 - dots / denom
            else:
                dist = np.maximum(
                    qn[qrows][:, None] + index.norms[xrows][None, :] - 2.0 * dots, 0.0
                )
            kk = min(k, dist.shape[1])
            part = np.argpartition(dist, kk - 1, axis=1)[:, :kk]
            pv = np.take_along_axis(dist, part, axis=1)
            best_d = np.concatenate([best_d, pv], axis=1)
            best_i = np.concatenate([best_i, xrows[part]], axis=1)
            keep = np.argsort(best_d, axis=1)[:, :k]
            best_d = np.take_along_axis(best_d, keep, axis=1)
            best_i = np.take_along_axis(best_i, keep, axis=1)
        pad = k - best_d.shape[1]
        if pad > 0:
            best_d = np.pad(best_d, ((0, 0), (0, pad)), constant_values=np.inf)
            best_i = np.pad(best_i, ((0, 0), (0, pad)))
        if metric == DistanceType.L2SqrtExpanded:
            best_d = np.sqrt(np.maximum(best_d, 0.0))
        if ip:
            best_d = -best_d
        out_d[qs : qs + len(qrows)] = best_d
        out_i[qs : qs + len(qrows)] = best_i
    return out_d, out_i
