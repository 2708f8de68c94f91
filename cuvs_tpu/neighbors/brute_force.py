"""Exact brute-force k-NN — the ground-truth tier.

Reference: ``cuvs::neighbors::brute_force``
(/root/reference/cpp/include/cuvs/neighbors/brute_force.hpp:37-168; tiled
kernel ``tiled_brute_force_knn``
/root/reference/cpp/src/neighbors/detail/knn_brute_force.cuh:62-267: GEMM
tile -> per-tile select_k -> cross-tile merge).

TPU-native: the dataset is reshaped into static [n_tiles, tile, d] blocks;
a ``lax.scan`` walks tiles keeping a running sorted top-k per query
(merge = top_k over the 2k concatenation). Each tile's distance block is
one MXU matmul with the metric epilogue fused by XLA; prefilters mask the
tile block with +inf before selection. Queries are chunked with ``lax.map``
to bound the [chunk, tile] intermediate.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from cuvs_tpu.distance import pairwise
from cuvs_tpu.utils.tracing import traced
from cuvs_tpu.distance.pairwise import DistanceType, normalize_metric, is_min_close
from cuvs_tpu.neighbors import filters as filt
from cuvs_tpu.selection.select_k import select_k, topk


@flax.struct.dataclass
class Index:
    """Brute-force index: dataset + precomputed norms (brute_force.hpp:37).

    ``q_scale`` is set when the dataset is stored int8-quantized
    (``build(..., storage_dtype=jnp.int8)``): rows are
    ``round(x / q_scale)`` and the scan runs on the MXU's int8 path
    (2x the bf16 FLOPs and half the HBM traffic on v5e) with dots
    rescaled by ``q_scale**2``; norms stay exact f32 from the original
    data. Pair with ``neighbors.refine`` for exact final ranking.
    """

    dataset: jnp.ndarray  # [n, d]
    norms: Optional[jnp.ndarray]  # [n] squared L2 (L2 family) / L2 (cosine)
    q_scale: Optional[jnp.ndarray] = None  # [] f32, int8 storage only
    metric: DistanceType = flax.struct.field(pytree_node=False, default=DistanceType.L2Expanded)
    metric_arg: float = flax.struct.field(pytree_node=False, default=2.0)

    @property
    def size(self) -> int:
        return self.dataset.shape[0]

    @property
    def dim(self) -> int:
        return self.dataset.shape[1]


@traced("brute_force::build")
def build(dataset, metric="sqeuclidean", metric_arg: float = 2.0,
          storage_dtype=None) -> Index:
    """Build an exact-search index (precomputes row norms for L2/cosine).

    ``storage_dtype=jnp.int8`` stores globally-scaled int8 rows (see Index).
    """
    metric = normalize_metric(metric)
    dataset = jnp.asarray(dataset)
    norms = None
    if callable(metric) and not isinstance(metric, DistanceType):
        return Index(dataset=dataset, norms=None, metric=metric, metric_arg=metric_arg)
    if metric in (DistanceType.L2Expanded, DistanceType.L2SqrtExpanded):
        norms = pairwise.row_norms(dataset, squared=True)
    elif metric == DistanceType.CosineExpanded:
        norms = pairwise.row_norms(dataset, squared=False)
    q_scale = None
    if storage_dtype is not None and jnp.dtype(storage_dtype) == jnp.int8:
        if metric not in (DistanceType.L2Expanded, DistanceType.L2SqrtExpanded,
                          DistanceType.InnerProduct, DistanceType.CosineExpanded):
            raise ValueError("int8 storage supports L2/IP/cosine metrics only")
        xf = jnp.asarray(dataset, jnp.float32)
        q_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-30) / 127.0
        dataset = jnp.clip(jnp.round(xf / q_scale), -127, 127).astype(jnp.int8)
    elif storage_dtype is not None:
        dataset = dataset.astype(storage_dtype)
    return Index(dataset=dataset, norms=norms, q_scale=q_scale,
                 metric=metric, metric_arg=metric_arg)


def _tile_distances(metric, q, qn, tile, tile_norms, metric_arg, compute_dtype,
                    scale2=None):
    """Distances between query chunk [B,d] and dataset tile [T,d] -> [B,T].

    ``scale2`` set => q and tile are int8-quantized; dots run on the MXU
    int8 path (int32 accumulate) and are rescaled by scale2 = q_scale**2.
    """
    def dots_of(a, b):
        if scale2 is None:
            return pairwise._gemm(a, b, compute_dtype)
        di = lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        return di.astype(jnp.float32) * scale2

    if callable(metric) and not isinstance(metric, DistanceType):
        return jnp.asarray(metric(q, tile), jnp.float32)  # CustomUDF
    if metric in (DistanceType.L2Expanded, DistanceType.L2SqrtExpanded):
        dots = dots_of(q, tile)
        d = qn[:, None] + tile_norms[None, :] - 2.0 * dots
        return jnp.maximum(d, 0.0)  # sqrt deferred to postprocess
    if metric == DistanceType.InnerProduct:
        return dots_of(q, tile)
    if metric == DistanceType.CosineExpanded:
        dots = dots_of(q, tile)
        denom = jnp.maximum(qn[:, None] * tile_norms[None, :], 1e-30)
        return 1.0 - dots / denom
    if metric == DistanceType.BitwiseHamming:
        return pairwise._bitwise_hamming(q, tile)
    if metric == DistanceType.Haversine:
        return pairwise._haversine(q, tile)
    # long-tail metrics: VPU pointwise block
    return pairwise._pointwise(metric, q[:, None, :], tile[None, :, :], metric_arg)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "metric_arg", "tile_size", "chunk", "compute_dtype", "recall_target",
    ),
)
def _search_impl(
    dataset, norms, queries, prefilter, k, metric, metric_arg, tile_size, chunk,
    compute_dtype, recall_target, q_scale=None,
):
    n, d = dataset.shape
    nq = queries.shape[0]
    scale2 = None if q_scale is None else q_scale * q_scale
    is_udf = callable(metric) and not isinstance(metric, DistanceType)
    min_close = is_udf or metric != DistanceType.InnerProduct

    n_tiles = -(-n // tile_size)
    pad = n_tiles * tile_size - n
    data_p = jnp.pad(dataset, ((0, pad), (0, 0)))
    if norms is not None:
        norms_p = jnp.pad(norms, ((0, pad),))
    else:
        norms_p = jnp.zeros((n + pad,), jnp.float32)

    # query norms for expanded metrics
    qf = jnp.asarray(queries, jnp.float32)
    if metric in (DistanceType.L2Expanded, DistanceType.L2SqrtExpanded):
        qnorms = jnp.sum(qf * qf, axis=1)
    elif metric == DistanceType.CosineExpanded:
        qnorms = jnp.sqrt(jnp.sum(qf * qf, axis=1))
    else:
        qnorms = jnp.zeros((nq,), jnp.float32)

    qpad = (-nq) % chunk
    if q_scale is not None:  # quantize queries with the dataset's scale
        queries = jnp.clip(jnp.round(qf / q_scale), -127, 127).astype(jnp.int8)
    qp = jnp.pad(queries, ((0, qpad), (0, 0)))
    qnp = jnp.pad(qnorms, ((0, qpad),))
    qidp = jnp.arange(nq + qpad, dtype=jnp.int32)
    kk = min(k, tile_size)

    def block(qc, qn, qid, tile, tnorms, ids):
        """Distances of one [B, tile] block -> per-block top-k."""
        dist = _tile_distances(metric, qc, qn, tile, tnorms, metric_arg,
                               compute_dtype, scale2)
        order = dist if min_close else -dist
        valid = ids[None, :] < n
        mask = filt.passes(prefilter, qid[:, None], jnp.minimum(ids, n - 1)[None, :])
        if mask is not None:
            valid = jnp.logical_and(valid, mask)
        order = jnp.where(valid, order, jnp.inf)
        tv, ti_local = topk(order, kk, True, recall_target)
        return tv, ids[ti_local]

    if n_tiles == 1:
        # single-pass peak-FLOPs path (TPU-KNN design): one matmul block
        # per query chunk + one selection, no merge tree
        ids = jnp.arange(n + pad, dtype=jnp.int32)

        def chunk_fn(args):
            qc, qn, qid = args
            return block(qc, qn, qid, data_p, norms_p, ids)

        bv, bi = lax.map(
            chunk_fn, (qp.reshape(-1, chunk, d), qnp.reshape(-1, chunk), qidp.reshape(-1, chunk))
        )
    else:
        tiles = data_p.reshape(n_tiles, tile_size, d)
        norm_tiles = norms_p.reshape(n_tiles, tile_size)
        row_ids = jnp.arange(n_tiles * tile_size, dtype=jnp.int32).reshape(n_tiles, tile_size)

        def chunk_fn(args):
            qc, qn, qid = args

            def tile_step(carry, xs):
                best_v, best_i = carry
                tile, tnorms, ids = xs
                tv, ti = block(qc, qn, qid, tile, tnorms, ids)
                mv = jnp.concatenate([best_v, tv], axis=1)
                mi = jnp.concatenate([best_i, ti], axis=1)
                sv, sidx = lax.top_k(-mv, k)
                return (-sv, jnp.take_along_axis(mi, sidx, axis=1)), None

            init = (
                jnp.full((qc.shape[0], k), jnp.inf, jnp.float32),
                jnp.zeros((qc.shape[0], k), jnp.int32),
            )
            (bv, bi), _ = lax.scan(tile_step, init, (tiles, norm_tiles, row_ids))
            return bv, bi

        bv, bi = lax.map(
            chunk_fn, (qp.reshape(-1, chunk, d), qnp.reshape(-1, chunk), qidp.reshape(-1, chunk))
        )

    bv = bv.reshape(-1, bv.shape[-1])[:nq]
    bi = bi.reshape(-1, bi.shape[-1])[:nq]
    if bv.shape[1] < k:  # n < k padding
        bv = jnp.pad(bv, ((0, 0), (0, k - bv.shape[1])), constant_values=jnp.inf)
        bi = jnp.pad(bi, ((0, 0), (0, k - bi.shape[1])))

    # postprocess (reference postprocess_distances semantics)
    if metric == DistanceType.L2SqrtExpanded:
        bv = jnp.where(jnp.isfinite(bv), jnp.sqrt(jnp.maximum(bv, 0.0)), bv)
    if not min_close:
        bv = -bv  # back to similarity, descending
    return bv, bi


@traced("brute_force::search")
def search(
    index: Index,
    queries,
    k: int,
    prefilter: Optional[filt.Prefilter] = None,
    tile_size: Optional[int] = None,
    query_chunk: int = 1024,
    compute_dtype=jnp.float32,
    recall_target: Optional[float] = None,
    fused: bool = False,
    fused_tile_n: Optional[int] = None,
    fused_block_q: Optional[int] = None,
    fused_mxu_n: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN search. Returns (distances [nq,k], neighbors [nq,k] int32).

    ``recall_target < 1.0`` switches the selection to the TPU-approximate
    partial reduction (exact on CPU). ``fused=True`` routes L2/IP unfiltered
    searches through the Pallas fused distance+top-k kernel
    (ops/bf_topk_pallas.py) — exact, and HBM-traffic-free for the distance
    matrix. Filtered-out / padded slots carry +inf (-inf for InnerProduct).
    ``tile_size`` defaults to the whole dataset when the [chunk, n] block
    fits in ~512 MB, else column tiles.
    """
    queries = jnp.asarray(queries)
    nq = queries.shape[0]
    if prefilter is None:
        prefilter = filt.no_filter()
    exact_sel = recall_target is None
    if (
        fused
        and jax.default_backend() == "tpu"  # Pallas compiled mode is TPU-only
        and prefilter.is_none
        and index.metric in (DistanceType.L2Expanded, DistanceType.L2SqrtExpanded,
                             DistanceType.InnerProduct)
        # exact mode runs k masked-max rounds per tile; approx (bin) mode
        # only needs k to fit the per-tile bin pool
        and ((exact_sel and k <= 64) or (not exact_sel and k <= 128))
    ):
        from cuvs_tpu.ops import bf_topk_pallas

        return bf_topk_pallas.search(
            index.dataset, index.norms, queries, int(k), metric=index.metric,
            compute_dtype=compute_dtype, exact=exact_sel,
            q_scale=index.q_scale,
            tile_n=fused_tile_n, block_q=fused_block_q, mxu_n=fused_mxu_n,
        )
    query_chunk = int(min(query_chunk, max(8, nq)))
    if tile_size is None:
        budget_cols = max(8192, (512 * 1024 * 1024 // 4) // max(query_chunk, 1))
        tile_size = min(index.size, budget_cols)
    tile_size = int(min(tile_size, max(128, index.size)))
    return _search_impl(
        index.dataset,
        index.norms,
        queries,
        prefilter,
        int(k),
        index.metric,
        float(index.metric_arg),
        tile_size,
        query_chunk,
        compute_dtype,
        None if recall_target is None else float(recall_target),
        index.q_scale,
    )
