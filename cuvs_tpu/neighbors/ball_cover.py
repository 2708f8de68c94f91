"""Random Ball Cover: exact k-NN / eps-NN with landmark pruning.

Reference: ``cuvs::neighbors::ball_cover``
(/root/reference/cpp/include/cuvs/neighbors/ball_cover.hpp:173-334;
cpp/src/neighbors/ball_cover/ — landmark sampling + triangle-inequality
pruning, ball_cover.cuh:66-91).

TPU-native: landmarks come from balanced k-means; rows are stored in the
same dense sorted-by-cell layout as IVF. Results are EXACT: a query may
skip a whole cell only when the triangle-inequality lower bound
``d(q, L_c) - radius_c`` exceeds its current certificate (the kth best
distance from probing the most promising cells first). On TPU the pruning
is expressed as masked whole-cell scans — cells are the unit of work, so
the mask saves HBM bandwidth without dynamic shapes. For eps-NN the bound
is simply eps.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from cuvs_tpu.cluster import kmeans_balanced
from cuvs_tpu.distance import pairwise
from cuvs_tpu.distance.pairwise import DistanceType, normalize_metric
from cuvs_tpu.neighbors import ivf_common as ivf
from cuvs_tpu.neighbors import ivf_flat
from cuvs_tpu.selection.select_k import topk


@flax.struct.dataclass
class Index:
    inner: ivf_flat.Index  # reuse the sorted-cell machinery
    radii: jnp.ndarray  # [n_cells] max distance of member to its landmark

    @property
    def size(self):
        return self.inner.size


def build(dataset, n_landmarks: Optional[int] = None, metric="euclidean", seed: int = 0) -> Index:
    """Landmarks ~ sqrt(n) by default (ball_cover.cuh:66-91)."""
    dataset = jnp.asarray(dataset)
    n = dataset.shape[0]
    metric = normalize_metric(metric)
    if n_landmarks is None:
        n_landmarks = max(1, int(n ** 0.5))
    inner = ivf_flat.build(
        dataset, n_lists=n_landmarks, metric=DistanceType.L2Expanded, seed=seed
    )
    # per-cell radius: max member distance to landmark
    xf = jnp.asarray(dataset, jnp.float32)
    labels = kmeans_balanced.predict(xf, inner.centers)
    d2 = jnp.sum((xf - inner.centers[labels]) ** 2, axis=1)
    radii = jnp.zeros((inner.n_lists,), jnp.float32).at[labels].max(jnp.sqrt(d2))
    return Index(inner=inner, radii=radii)


def knn_query(index: Index, queries, k: int, two_pass: bool = True
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN (ball_cover.hpp:215 ``knn_query``).

    Pass 1 probes the closest cells for a distance certificate; pass 2
    scans only cells whose triangle-inequality lower bound beats it.
    Returns sqrt-L2 distances (reference uses L2SqrtUnexpanded).
    """
    inner = index.inner
    queries = jnp.asarray(queries)
    n_cells = inner.n_lists
    qf = jnp.asarray(queries, jnp.float32)
    nq = qf.shape[0]
    dc = jnp.sqrt(jnp.maximum(
        jnp.sum(qf * qf, 1)[:, None] + inner.center_norms[None, :]
        - 2.0 * pairwise._gemm(qf, inner.centers, jnp.float32), 0.0))

    # pass 1: certificate from the closest ~sqrt(cells) cells
    p1 = max(1, min(n_cells, int(n_cells ** 0.5) + 1))
    _, close_cells = lax.top_k(-dc, p1)
    needed1 = jnp.zeros((nq, n_cells), bool).at[
        jnp.arange(nq)[:, None], close_cells
    ].set(True)
    d1, i1 = _masked_full_scan(inner, queries, k, needed1)
    if not two_pass or p1 == n_cells:
        return ivf.postprocess_distances(d1, DistanceType.L2SqrtExpanded), i1
    cert = jnp.sqrt(jnp.maximum(d1[:, -1], 0.0))  # kth best (sqrt space)

    # pass 2: cells whose triangle-inequality lower bound beats the cert
    # and weren't already scanned
    lower = dc - index.radii[None, :]
    needed2 = jnp.logical_and(lower <= cert[:, None], jnp.logical_not(needed1))
    d2, i2 = _masked_full_scan(inner, queries, k, needed2)
    mv = jnp.concatenate([d1, d2], axis=1)
    mi = jnp.concatenate([i1, i2], axis=1)
    tv, tl = topk(mv, k, True, None)
    out_i = jnp.take_along_axis(mi, tl, axis=1)
    return ivf.postprocess_distances(tv, DistanceType.L2SqrtExpanded), out_i


def all_knn_query(index: Index, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k-NN of every indexed point (ball_cover.hpp:173)."""
    return knn_query(
        index, index.inner.sorted_data[: index.size, : index.inner.dim], k
    )


@functools.partial(jax.jit, static_argnames=("k",))
def _masked_full_scan(inner, queries, k, needed):
    """Scan all cells; contributions masked where ``needed`` is False."""
    qf = jnp.asarray(queries, jnp.float32)
    nq = qf.shape[0]
    qnorm = jnp.sum(qf * qf, axis=1)
    W = inner.window
    # stored rows are lane-aligned (zero-padded to a 128-multiple width);
    # matching zero columns on the queries leave the dots unchanged
    dp = inner.sorted_data.shape[1]
    if dp != qf.shape[1]:
        qf = jnp.pad(qf, ((0, 0), (0, dp - qf.shape[1])))

    def cell_step(carry, c):
        best_v, best_i = carry
        start = inner.lists.offsets[c]
        data_w = lax.dynamic_slice(
            inner.sorted_data, (start, 0), (W, inner.sorted_data.shape[1]))
        ids_w = lax.dynamic_slice(inner.lists.ids, (start,), (W,))
        lab_w = lax.dynamic_slice(inner.lists.labels, (start,), (W,))
        norm_w = lax.dynamic_slice(inner.sorted_norms, (start,), (W,))
        dots = pairwise._gemm(qf, data_w, jnp.float32)
        dist = jnp.maximum(qnorm[:, None] + norm_w[None, :] - 2.0 * dots, 0.0)
        valid = (lab_w == c)[None, :] & needed[:, c][:, None]
        dist = jnp.where(valid, dist, jnp.inf)
        tv, tl = lax.top_k(-dist, min(k, W))
        ti = ids_w[tl]
        mv = jnp.concatenate([best_v, -tv], axis=1)
        mi = jnp.concatenate([best_i, ti], axis=1)
        sv, sidx = lax.top_k(-mv, k)
        return ((-sv), jnp.take_along_axis(mi, sidx, axis=1)), None

    init = (jnp.full((nq, k), jnp.inf, jnp.float32), jnp.zeros((nq, k), jnp.int32))
    (bv, bi), _ = lax.scan(cell_step, init, jnp.arange(inner.n_lists))
    return bv, bi


def eps_nn(index: Index, queries, eps: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Within-radius neighbors as a dense boolean adjacency + degrees
    (ball_cover.hpp:300 eps_nn). Cells with lower bound > eps are pruned."""
    inner = index.inner
    qf = jnp.asarray(queries, jnp.float32)
    dc = jnp.sqrt(jnp.maximum(
        jnp.sum(qf * qf, 1)[:, None] + inner.center_norms[None, :]
        - 2.0 * pairwise._gemm(qf, inner.centers, jnp.float32), 0.0))
    needed = (dc - index.radii[None, :]) <= eps
    n = index.size
    adj = jnp.zeros((qf.shape[0], n), bool)
    qnorm = jnp.sum(qf * qf, axis=1)
    W = inner.window
    dp = inner.sorted_data.shape[1]
    if dp != qf.shape[1]:  # lane-aligned storage: zero-pad query columns
        qf = jnp.pad(qf, ((0, 0), (0, dp - qf.shape[1])))
    for c in range(inner.n_lists):  # host loop: cells are few (~sqrt n)
        start = int(inner.lists.offsets[c])
        data_w = inner.sorted_data[start : start + W]
        ids_w = inner.lists.ids[start : start + W]
        lab_w = inner.lists.labels[start : start + W]
        norm_w = inner.sorted_norms[start : start + W]
        dots = pairwise._gemm(qf, data_w, jnp.float32)
        dist = jnp.sqrt(jnp.maximum(qnorm[:, None] + norm_w[None, :] - 2.0 * dots, 0.0))
        hit = (dist <= eps) & (lab_w == c)[None, :] & needed[:, c][:, None]
        adj = adj.at[:, ids_w].max(hit)
    return adj, jnp.sum(adj, axis=1).astype(jnp.int32)
