"""CAGRA: fixed-degree graph ANN index.

Reference: ``cuvs::neighbors::cagra``
(/root/reference/cpp/include/cuvs/neighbors/cagra.hpp; build dispatch
cpp/src/neighbors/detail/cagra/cagra_build.cuh:2206-2334; single-CTA search
kernel jit_lto_kernels/search_single_cta_jit.cuh:112-378; plan
search_plan.cuh:113-260). Defaults mirror the reference:
intermediate_graph_degree=128, graph_degree=64, itopk_size=64,
search_width=1, max_iterations auto.

TPU-native design:
  * build = knn_graph (exact MXU self-search or IVF-PQ+refine) followed by
    the vectorized detour-count optimizer (graph_core.py).
  * search = ONE jitted ``lax.while_loop`` over the whole query batch —
    the analog of the reference's fused single-CTA kernel. Per-query state
    is the itopk list (distances, packed id+explored flag). Each step
    explores ``search_width`` best unexplored parents, gathers their
    adjacency rows, dedups candidates against the itopk by dense compare
    (replacing the CUDA visited hashmap), computes distances as batched
    gather+dot, and bitonic-merges into the itopk via top_k.
  * filtering: candidate distances are masked before the merge, with the
    unfiltered traversal still using the node (reference filtering
    semantics: filtered nodes route but are not returned).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from cuvs_tpu.distance import pairwise
from cuvs_tpu.utils.tracing import traced
from cuvs_tpu.distance.pairwise import DistanceType, normalize_metric
from cuvs_tpu.neighbors import filters as filt
from cuvs_tpu.neighbors import graph_core, knn_graph
from cuvs_tpu.neighbors import ivf_pq as ivfpq


@dataclasses.dataclass(frozen=True)
class IndexParams:
    """Mirrors cagra::index_params (cagra.hpp:149-255)."""

    intermediate_graph_degree: int = 128
    graph_degree: int = 64
    metric: DistanceType = DistanceType.L2Expanded
    build_algo: str = "auto"  # "auto" | "brute_force" | "ivf_pq"
    ivf_pq_params: Optional[ivfpq.IndexParams] = None
    refine_ratio: float = 2.0
    seed: int = 0
    build_compute_dtype: object = None  # e.g. jnp.bfloat16 for 8x faster graphs
    build_recall_target: object = None  # approx selection during graph build
    nn_descent_params: object = None  # override the nn_descent build config
    storage_dtype: object = None  # store the dataset as e.g. bfloat16
    # (halves beam-search HBM gather traffic; norms stay f32)
    guarantee_connectivity: bool = False  # MST-style augmentation
    # (graph_core.cuh:487-644) so every node is reachable
    build_n_probes: int = 0  # ivf_pq graph-build probes (0 = auto); set
    # by from_hnsw_params' efc heuristic (cagra.cpp:28-30)

    def __post_init__(self):
        object.__setattr__(self, "metric", normalize_metric(self.metric))

    @staticmethod
    def from_hnsw_params(
        n_rows: int,
        dim: int,
        M: int,
        ef_construction: int,
        heuristic: str = "similar_search_performance",
        metric: DistanceType = DistanceType.L2Expanded,
    ) -> "IndexParams":
        """Build params matching a target HNSW index (cagra.hpp:118-147,
        heuristic bodies cpp/src/neighbors/cagra.cpp:13-56).

        ``heuristic``: "similar_search_performance" tunes degrees so the
        from-CAGRA HNSW matches the reference HNSW's recall/QPS curve;
        "same_graph_footprint" matches the binary size
        (graph_degree = 2*M). Small datasets (<1e6 rows) build the knn
        graph with nn-descent (max_iterations scaled by efc), larger
        ones with IVF-PQ (n_probes scaled by sqrt(n_lists) and efc).
        """
        h = heuristic.lower()
        if h == "same_graph_footprint":
            graph_degree = 2 * M
            intermediate = 3 * M
        elif h == "similar_search_performance":
            graph_degree = 2 + 2 * M // 3
            intermediate = M + M * ef_construction // 256
        else:
            raise ValueError(f"unknown heuristic {heuristic!r}")
        intermediate = max(intermediate, graph_degree)
        if n_rows < 1_000_000:
            from cuvs_tpu.neighbors import nn_descent as nnd

            return IndexParams(
                intermediate_graph_degree=intermediate,
                graph_degree=graph_degree,
                metric=metric,
                build_algo="nn_descent",
                nn_descent_params=nnd.IndexParams(
                    graph_degree=intermediate,
                    intermediate_graph_degree=max(2 * intermediate, 32),
                    max_iterations=5 + ef_construction // 16,
                ),
            )
        import math

        n_lists = max(1, int(math.sqrt(n_rows)))
        return IndexParams(
            intermediate_graph_degree=intermediate,
            graph_degree=graph_degree,
            metric=metric,
            build_algo="ivf_pq",
            ivf_pq_params=ivfpq.IndexParams(
                n_lists=n_lists, metric=metric,
            ),
            # n_probes heuristic (cagra.cpp:28-30) is applied at build
            # time via build_n_probes
            build_n_probes=round(2 + math.sqrt(n_lists) / 20
                                 + ef_construction / 16),
        )


@dataclasses.dataclass(frozen=True)
class SearchParams:
    """Mirrors cagra::search_params (cagra.hpp:280-355)."""

    itopk_size: int = 64
    search_width: int = 1
    max_iterations: int = 0  # 0 = auto
    num_random_samplings: int = 1
    rand_xor_mask: int = 0x128394
    compute_dtype: object = jnp.float32
    query_chunk: int = 1024
    # visited-ring capacity (the TPU analog of the reference's visited
    # hashmap, hashmap.hpp:23-60): ids expanded in the last visited_size
    # expansions cannot re-enter the itopk, so beam slots are not wasted
    # re-expanding nodes that were evicted and re-proposed. 0 = auto
    # (covers every expansion the iteration budget allows, capped at
    # 256); -1 = ring OFF (dedup against the itopk only — the cheaper
    # pre-r4 behavior, for measuring the ring's recall/VPU trade-off).
    visited_size: int = 0


@flax.struct.dataclass
class Index:
    dataset: jnp.ndarray  # [n, d]
    dataset_norms: jnp.ndarray  # [n] squared L2
    graph: jnp.ndarray  # [n, graph_degree] int32
    metric: DistanceType = flax.struct.field(pytree_node=False, default=DistanceType.L2Expanded)

    @property
    def size(self) -> int:
        return self.dataset.shape[0]

    @property
    def dim(self) -> int:
        return self.dataset.shape[1]

    @property
    def graph_degree(self) -> int:
        return self.graph.shape[1]

    @property
    def data_pack(self):
        return (self.dataset,)


@flax.struct.dataclass
class CompressedIndex:
    """CAGRA index over a VPQ-compressed dataset (cagra.hpp ``compression``
    VPQ option; dataset abstraction common.hpp:411 vpq_dataset). Candidate
    vectors are decoded on the fly during the beam search."""

    vq_centers: jnp.ndarray  # [vq_n, d]
    vq_codes: jnp.ndarray  # [n] int32
    pq_codes: jnp.ndarray  # [n, pq_dim] uint8
    pq_codebooks: jnp.ndarray  # [pq_dim, book, pq_len]
    dataset_norms: jnp.ndarray  # [n] squared norms of the RECONSTRUCTION
    graph: jnp.ndarray  # [n, degree] int32
    metric: DistanceType = flax.struct.field(pytree_node=False, default=DistanceType.L2Expanded)

    @property
    def size(self) -> int:
        return self.vq_codes.shape[0]

    @property
    def dim(self) -> int:
        return self.vq_centers.shape[1]

    @property
    def graph_degree(self) -> int:
        return self.graph.shape[1]

    @property
    def data_pack(self):
        return (self.vq_centers, self.vq_codes, self.pq_codes, self.pq_codebooks)


@flax.struct.dataclass
class PackedIndex:
    """Gather-optimal CAGRA layout: each node's record bundles its neighbor
    ids, the neighbors' int8-quantized vectors, and their norms.

    Motivation (measured, docs/benchmarks.md): TPU beam search is bound by
    the RATE of scattered HBM row gathers, not bytes — expanding one parent
    in the standard layout costs ``deg`` scattered vector-row fetches, and
    per-iteration cost saturates at ~4.4 ms for a 4096-query batch
    regardless of dtype. Packing the child vectors next to the adjacency
    row turns that into ONE wide row fetch per parent (deg*(d+6) bytes),
    ~20x fewer rows per iteration. The price is index memory
    (deg*(d+6) bytes/node, e.g. 4.3 GB at 1M x 128 x deg32) — this mode
    trades HBM for serving QPS, the inverse of CompressedIndex.

    No reference analog: GPU warps gather cheaply so cuVS never needs this;
    it is the TPU-native answer to cagra search (search_single_cta_jit.cuh).
    """

    graph: jnp.ndarray  # [n, deg] int32
    # child vectors, split along the NEIGHBOR axis into <=2 GiB pieces
    # ([n, deg_i, d] int8 each, sum(deg_i) == deg): at reference degrees
    # the monolithic [n, deg, d] array is 8 GiB, and a single allocation
    # that size fails on a post-build fragmented 16 GB HBM even though
    # the bytes are free (r5 evidence: fresh-process 12 GiB allocs
    # succeed; in-process pack OOMs). Serving gathers one wide row per
    # piece per parent — bytes identical, still ~deg/len(pieces) x fewer
    # row fetches than the standard layout.
    child_vecs: tuple  # tuple[jnp.ndarray [n, deg_i, d] int8, ...]
    child_norms: jnp.ndarray  # [n, deg] f32 squared norms (f32 exact)
    dataset_int8: jnp.ndarray  # [n, d] int8 (seed + extend entry points)
    dataset_norms: jnp.ndarray  # [n] f32
    scale: jnp.ndarray  # [] f32 int8 quantization scale
    metric: DistanceType = flax.struct.field(pytree_node=False, default=DistanceType.L2Expanded)

    @property
    def size(self) -> int:
        return self.graph.shape[0]

    @property
    def dim(self) -> int:
        return self.dataset_int8.shape[1]

    @property
    def graph_degree(self) -> int:
        return self.graph.shape[1]


def pack(index: Index, _blk: int = 0,
         _piece_bytes: int = 2 << 30) -> PackedIndex:
    """Repack a CAGRA index for gather-optimal serving (see PackedIndex).

    ``_blk`` overrides the gather chunk rows (tests exercise the padded-
    tail path with it; 0 = auto-size to the ~1 GB transient budget);
    ``_piece_bytes`` bounds each child_vecs piece (tests force the
    multi-piece path with a tiny budget)."""
    if index.metric not in (DistanceType.L2Expanded, DistanceType.L2SqrtExpanded,
                            DistanceType.InnerProduct):
        raise ValueError("packed search supports L2/IP metrics")
    # Peak-HBM discipline: at reference scale the child array alone is
    # 8.2 GB (1M x 64 x 128 int8) on a 16 GB chip, so every transient here
    # is chunked and freed before the big gather runs (r5: the original
    # whole-array f32 quantize + post-gather [:n] slice both OOMed).
    x = jnp.asarray(index.dataset)
    g = index.graph
    n, deg = g.shape
    d = x.shape[1]
    scale = (jnp.maximum(jnp.max(jnp.abs(x)), 1e-30) / 127.0).astype(jnp.float32)
    qblk = max(1, min(n, (256 << 20) // max(4 * d, 1)))  # ~256M f32 transient
    nqb = -(-n // qblk)
    xp = jnp.pad(x, ((0, nqb * qblk - n), (0, 0)))
    x8 = lax.map(
        lambda xb: jnp.clip(jnp.round(xb.astype(jnp.float32) / scale),
                            -127, 127).astype(jnp.int8),
        xp.reshape(nqb, qblk, d),
    ).reshape(nqb * qblk, d)[:n]
    del xp
    child_norms = index.dataset_norms[g]  # [n, deg] f32, before the 8 GB peak
    # split the [n, deg, d] child array along the NEIGHBOR axis into
    # <=_piece_bytes pieces (see PackedIndex.child_vecs), and chunk each
    # piece's gather to bound the transient to ~1 GB per step; prefer a
    # divisor block so no padded tail is materialized (search gathers by
    # parent id < n, so tail rows would be unread — but they still cost
    # HBM at reference scale)
    deg_i = max(1, min(deg, _piece_bytes // max(n * d, 1)))
    blk = _blk or max(1, min(n, (1 << 30) // max(deg_i * d, 1)))
    if not _blk:
        for cand in range(blk, max(blk // 4, 0), -1):
            if n % cand == 0:
                blk = cand
                break
    nb = -(-n // blk)
    gp = jnp.pad(g, ((0, nb * blk - n), (0, 0))) if nb * blk != n else g
    pieces = []
    for off in range(0, deg, deg_i):
        gcols = gp[:, off : off + deg_i]
        child = lax.map(lambda gb: x8[gb], gcols.reshape(nb, blk, -1))
        child = child.reshape(nb * blk, gcols.shape[1], d)
        jax.block_until_ready(child)
        pieces.append(child)
    return PackedIndex(
        graph=g,
        child_vecs=tuple(pieces),
        child_norms=child_norms,
        dataset_int8=x8,
        dataset_norms=index.dataset_norms,
        scale=scale,
        metric=index.metric,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "itopk", "search_width", "max_iter", "n_random",
                     "vis_size", "metric", "compute_dtype"),
)
def _search_chunk_packed(
    graph, child_vecs, child_norms, dataset_int8, dataset_norms, scale,
    queries, qids, prefilter, key, k, itopk, search_width, max_iter,
    n_random, vis_size, metric, compute_dtype,
):
    """Beam search over the packed layout. Same traversal semantics as
    ``_search_chunk``; candidate vectors come from the PARENT's packed
    record (one wide gather) instead of per-child dataset rows."""
    n, deg = graph.shape
    B = queries.shape[0]
    L = itopk
    W = search_width
    C = W * deg
    EXPLORED = jnp.int32(1 << 30)
    ip = metric == DistanceType.InnerProduct

    qf = jnp.asarray(queries, jnp.float32)
    qnorm = jnp.sum(qf * qf, axis=1)
    qc = (qf / scale).astype(compute_dtype)  # fold scale into the query side

    def dist_from_dots(dots, norms_rows):
        # dots are in (query/scale)·(x/scale) units; scale^2 restores them
        real = dots * (scale * scale)
        if ip:
            return -real
        return jnp.maximum(qnorm[:, None] + norms_rows - 2.0 * real, 0.0)

    # --- seed init from the int8 dataset rows (num_random_samplings * L
    # randoms, best L kept — cagra.hpp num_random_samplings semantics) ---
    n_seeds = max(L, n_random * L)
    seeds = jax.random.randint(key, (B, n_seeds), 0, n)
    svecs = dataset_int8[seeds].astype(compute_dtype)  # [B, S, d]
    sdots = lax.dot_general(
        qc[:, None, :], svecs, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=pairwise.matmul_precision(compute_dtype),
    )[:, 0, :]
    seed_d = dist_from_dots(sdots, dataset_norms[seeds])
    eq = seeds[:, :, None] == seeds[:, None, :]
    earlier = jnp.tril(jnp.ones((n_seeds, n_seeds), bool), k=-1)
    seed_d = jnp.where(jnp.any(jnp.logical_and(eq, earlier[None]), axis=2), jnp.inf, seed_d)
    sv, sid = lax.sort((seed_d, seeds), dimension=1, num_keys=1)
    state_v, state_id = sv[:, :L], sid[:, :L]
    vis0 = jnp.full((B, max(vis_size, 1)), -2, jnp.int32)

    def cond(st):
        state_v, state_id, vis, it = st
        unexplored = jnp.logical_and(state_id >= 0, (state_id & EXPLORED) == 0)
        has_work = jnp.any(jnp.logical_and(unexplored, jnp.isfinite(state_v)))
        return jnp.logical_and(it < max_iter, has_work)

    def body(st):
        state_v, state_id, vis, it = st
        raw_id = state_id & (EXPLORED - 1)
        unexplored = jnp.logical_and(
            jnp.logical_and(state_id >= 0, (state_id & EXPLORED) == 0),
            jnp.isfinite(state_v),
        )
        rank = jnp.cumsum(unexplored.astype(jnp.int32), axis=1)
        sel = jnp.logical_and(unexplored, rank <= W)
        slot = jnp.where(sel, rank - 1, W)
        parent_ids = jnp.full((B, W + 1), -1, jnp.int32).at[
            jnp.arange(B)[:, None], slot
        ].set(jnp.where(sel, raw_id, -1), mode="drop")[:, :W]
        parent_valid = parent_ids >= 0
        state_id = jnp.where(sel, state_id | EXPLORED, state_id)
        if vis_size > 0:  # ring OFF (visited_size=-1): skip the update
            pos = (it * W + jnp.arange(W, dtype=jnp.int32)) % vis_size
            vis = vis.at[jnp.arange(B)[:, None], pos[None, :]].set(
                jnp.where(parent_valid, parent_ids, -2)
            )

        safe_p = jnp.where(parent_valid, parent_ids, 0)
        children = graph[safe_p].reshape(B, C)
        # one wide row gather per child_vecs piece per parent; pieces are
        # deg-axis splits in column order, so concat rebuilds [B, W, deg, d]
        cvecs = jnp.concatenate([cv[safe_p] for cv in child_vecs], axis=2)
        cvecs = cvecs.astype(compute_dtype).reshape(B, C, -1)
        cnorms = child_norms[safe_p].reshape(B, C)
        children = jnp.where(jnp.repeat(parent_valid, deg, axis=1), children, -1)

        dup_itopk = jnp.any(children[:, :, None] == raw_id[:, None, :], axis=2)
        ceq = children[:, :, None] == children[:, None, :]
        c_earlier = jnp.tril(jnp.ones((C, C), bool), k=-1)
        dup_within = jnp.any(jnp.logical_and(ceq, c_earlier[None]), axis=2)
        invalid = jnp.logical_or(
            children < 0, jnp.logical_or(dup_itopk, dup_within))
        if vis_size > 0:
            dup_vis = jnp.any(children[:, :, None] == vis[:, None, :], axis=2)
            invalid = jnp.logical_or(invalid, dup_vis)

        dots = lax.dot_general(
            qc[:, None, :], cvecs, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=pairwise.matmul_precision(compute_dtype),
        )[:, 0, :]
        cand_d = dist_from_dots(dots, cnorms)
        cand_d = jnp.where(invalid, jnp.inf, cand_d)

        mv = jnp.concatenate([state_v, cand_d], axis=1)
        mid = jnp.concatenate([state_id, children], axis=1)
        sv2, sid2 = lax.sort((mv, mid), dimension=1, num_keys=1)
        return (sv2[:, :L], sid2[:, :L], vis, it + 1)

    state_v, state_id, _, _ = lax.while_loop(
        cond, body, (state_v, state_id, vis0, jnp.int32(0)))

    raw_id = state_id & (EXPLORED - 1)
    out_v = jnp.where(state_id >= 0, state_v, jnp.inf)
    mask = filt.passes(prefilter, qids[:, None], jnp.maximum(raw_id, 0))
    if mask is not None:
        out_v = jnp.where(mask, out_v, jnp.inf)
        fv, fid = lax.sort((out_v, raw_id), dimension=1, num_keys=1)
        out_ids, out_d = fid[:, :k], fv[:, :k]
    else:
        out_ids, out_d = raw_id[:, :k], out_v[:, :k]
    if ip:
        out_d = -out_d
    if metric == DistanceType.L2SqrtExpanded:
        out_d = jnp.where(jnp.isfinite(out_d), jnp.sqrt(jnp.maximum(out_d, 0.0)), out_d)
    return out_d, out_ids


def compress(index: Index, vq_n_centers: int = 256, pq_dim: int = 0,
             pq_bits: int = 8, seed: int = 0) -> CompressedIndex:
    """Replace the raw dataset with VPQ codes (cagra compression,
    cagra_build.cuh:2311 vpq_build path). Graph is kept as-is."""
    from cuvs_tpu.preprocessing import quantize as q

    vpq = q.vpq_train(index.dataset, vq_n_centers=vq_n_centers, pq_dim=pq_dim,
                      pq_bits=pq_bits, seed=seed)
    vq_codes, pq_codes = q.vpq_encode(vpq, index.dataset)
    recon = q.vpq_decode(vpq, vq_codes, pq_codes)
    return CompressedIndex(
        vq_centers=vpq.vq_centers,
        vq_codes=vq_codes,
        pq_codes=pq_codes,
        pq_codebooks=vpq.pq.codebooks,
        dataset_norms=pairwise.row_norms(recon),
        graph=index.graph,
        metric=index.metric,
    )


@traced("cagra::build")
def build(dataset, params: Optional[IndexParams] = None, **kw) -> Index:
    """knn graph -> optimize -> index (cagra_build.cuh:2206)."""
    if params is None:
        params = IndexParams(**kw)
    dataset = jnp.asarray(dataset)
    n = dataset.shape[0]
    ideg = min(params.intermediate_graph_degree, n - 1)
    gdeg = min(params.graph_degree, ideg)
    neighbors, _ = knn_graph.build_knn_graph(
        dataset,
        ideg,
        metric=params.metric,
        algo=params.build_algo,
        ivf_pq_params=params.ivf_pq_params,
        refine_ratio=params.refine_ratio,
        seed=params.seed,
        compute_dtype=params.build_compute_dtype,
        recall_target=params.build_recall_target,
        nn_descent_params=params.nn_descent_params,
        n_probes=params.build_n_probes,
    )
    graph = graph_core.optimize(
        neighbors, gdeg,
        guarantee_connectivity=params.guarantee_connectivity,
        dataset=dataset if params.guarantee_connectivity else None,
    )
    return from_graph(dataset, graph, metric=params.metric,
                      storage_dtype=params.storage_dtype)


def from_graph(dataset, graph, metric=DistanceType.L2Expanded,
               storage_dtype=None) -> Index:
    """Assemble an index from an existing graph (update_graph semantics)."""
    dataset = jnp.asarray(dataset)
    norms = pairwise.row_norms(dataset)
    if storage_dtype is not None:
        dataset = dataset.astype(storage_dtype)
    return Index(
        dataset=dataset,
        dataset_norms=norms,
        graph=jnp.asarray(graph, jnp.int32),
        metric=normalize_metric(metric),
    )


def _decode_rows(data_pack, ids):
    """Rows for candidate ids from raw or VPQ-compressed storage."""
    if len(data_pack) == 1:
        return data_pack[0][ids]
    vq_centers, vq_codes, pq_codes, codebooks = data_pack
    c = pq_codes[ids].astype(jnp.int32)  # [..., pq_dim]
    pq_dim = codebooks.shape[0]
    rec = codebooks[jnp.arange(pq_dim), c, :]  # [..., pq_dim, pq_len]
    rec = rec.reshape(c.shape[:-1] + (-1,))
    return vq_centers[vq_codes[ids]] + rec[..., : vq_centers.shape[1]]


def _distances_to(data_pack, dataset_norms, q, qnorm, ids, metric, compute_dtype):
    """Batched query->nodes distances. q [B,d], ids [B,C] -> [B,C]."""
    vecs = _decode_rows(data_pack, ids)  # [B, C, d]
    dots = lax.dot_general(
        q.astype(compute_dtype)[:, None, :],
        vecs.astype(compute_dtype),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=pairwise.matmul_precision(compute_dtype),
    )[:, 0, :]
    if metric == DistanceType.InnerProduct:
        return -dots  # min-space
    return jnp.maximum(qnorm[:, None] + dataset_norms[ids] - 2.0 * dots, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "itopk", "search_width", "max_iter", "n_random", "vis_size",
        "metric", "compute_dtype",
    ),
)
def _search_chunk(
    data_pack,
    dataset_norms,
    graph,
    queries,
    qids,
    prefilter,
    key,
    k,
    itopk,
    search_width,
    max_iter,
    n_random,
    vis_size,
    metric,
    compute_dtype,
):
    n = dataset_norms.shape[0]
    deg = graph.shape[1]
    B = queries.shape[0]
    L = itopk
    C = search_width * deg  # candidates per iteration
    EXPLORED = jnp.int32(1 << 30)  # flag packed into id payload

    qf = jnp.asarray(queries, jnp.float32)
    qnorm = jnp.sum(qf * qf, axis=1)
    qc = queries

    def flt_mask(ids):
        m = filt.passes(prefilter, qids[:, None], ids)
        return None if m is None else m

    # --- random init (num_random_samplings * itopk seeds) ---
    n_seeds = max(L, n_random * L)
    seeds = jax.random.randint(key, (B, n_seeds), 0, n)
    seed_d = _distances_to(data_pack, dataset_norms, qc, qnorm, seeds, metric, compute_dtype)
    # dedup identical seeds (duplicates in the itopk would be returned twice):
    # mark every seed that equals an earlier seed (pairwise compare — cheaper
    # on the VPU than a sort at these widths)
    eq = seeds[:, :, None] == seeds[:, None, :]  # [B, S, S]
    earlier = jnp.tril(jnp.ones((n_seeds, n_seeds), bool), k=-1)
    s_dup = jnp.any(jnp.logical_and(eq, earlier[None]), axis=2)
    seed_d = jnp.where(s_dup, jnp.inf, seed_d)
    # the itopk state stays SORTED ascending by distance throughout; merges
    # are key+payload sorts (TPU sorts 128-wide rows ~10x faster than the
    # unaligned lax.top_k lowering)
    sv, sid = lax.sort((seed_d, seeds), dimension=1, num_keys=1)
    state_v = sv[:, :L]
    state_id = sid[:, :L]  # unexplored (flag clear)
    # visited ring (hashmap.hpp:23-60 analog): last vis_size expanded ids;
    # -2 fill so it never matches a real id or the -1 padding sentinel
    vis0 = jnp.full((B, max(vis_size, 1)), -2, jnp.int32)

    def cond(st):
        state_v, state_id, vis, it = st
        unexplored = jnp.logical_and(
            state_id >= 0, (state_id & EXPLORED) == 0
        )
        has_work = jnp.any(jnp.logical_and(unexplored, jnp.isfinite(state_v)))
        return jnp.logical_and(it < max_iter, has_work)

    def body(st):
        state_v, state_id, vis, it = st
        raw_id = state_id & (EXPLORED - 1)
        unexplored = jnp.logical_and(
            jnp.logical_and(state_id >= 0, (state_id & EXPLORED) == 0),
            jnp.isfinite(state_v),
        )
        # pick the search_width best unexplored parents: the state is
        # sorted, so they are the first W unexplored slots (cumsum rank
        # instead of a top_k pass)
        rank = jnp.cumsum(unexplored.astype(jnp.int32), axis=1)  # [B, L]
        sel = jnp.logical_and(unexplored, rank <= search_width)
        slot = jnp.where(sel, rank - 1, search_width)  # W = dropped
        parent_ids = jnp.full((B, search_width + 1), -1, jnp.int32).at[
            jnp.arange(B)[:, None], slot
        ].set(jnp.where(sel, raw_id, -1), mode="drop")[:, :search_width]
        parent_valid = parent_ids >= 0
        # mark explored
        state_id = jnp.where(sel, state_id | EXPLORED, state_id)
        # record the expansions in the visited ring (skipped when the
        # ring is off, visited_size=-1)
        if vis_size > 0:
            pos = (it * search_width + jnp.arange(search_width, dtype=jnp.int32)) % vis_size
            vis = vis.at[jnp.arange(B)[:, None], pos[None, :]].set(
                jnp.where(parent_valid, parent_ids, -2)
            )

        # gather children
        children = graph[jnp.where(parent_valid, parent_ids, 0)].reshape(B, C)
        children = jnp.where(
            jnp.repeat(parent_valid, deg, axis=1), children, -1
        )
        # dedup: against current itopk, the visited ring, and within the
        # candidate block (pairwise compares, no sorts — all VPU work that
        # fuses with the masking)
        dup_itopk = jnp.any(children[:, :, None] == raw_id[:, None, :], axis=2)
        ceq = children[:, :, None] == children[:, None, :]  # [B, C, C]
        c_earlier = jnp.tril(jnp.ones((C, C), bool), k=-1)
        dup_within = jnp.any(jnp.logical_and(ceq, c_earlier[None]), axis=2)
        invalid = jnp.logical_or(
            children < 0, jnp.logical_or(dup_itopk, dup_within))
        if vis_size > 0:
            dup_vis = jnp.any(children[:, :, None] == vis[:, None, :], axis=2)
            invalid = jnp.logical_or(invalid, dup_vis)

        cand_d = _distances_to(
            data_pack, dataset_norms, qc, qnorm, jnp.maximum(children, 0), metric, compute_dtype
        )
        cand_d = jnp.where(invalid, jnp.inf, cand_d)

        # merge candidates into the sorted itopk: one key+payload sort
        mv = jnp.concatenate([state_v, cand_d], axis=1)
        mid = jnp.concatenate([state_id, children], axis=1)
        sv2, sid2 = lax.sort((mv, mid), dimension=1, num_keys=1)
        return (sv2[:, :L], sid2[:, :L], vis, it + 1)

    state_v, state_id, _, _ = lax.while_loop(
        cond, body, (state_v, state_id, vis0, jnp.int32(0)))

    raw_id = state_id & (EXPLORED - 1)
    out_v = state_v
    mask = flt_mask(jnp.maximum(raw_id, 0))
    if mask is not None:
        out_v = jnp.where(mask, out_v, jnp.inf)
    out_v = jnp.where(state_id >= 0, out_v, jnp.inf)
    if mask is None:
        # state is already sorted; masking only re-sorts when a filter ran
        out_ids = raw_id[:, :k]
        out_d = out_v[:, :k]
    else:
        fv, fid = lax.sort((out_v, raw_id), dimension=1, num_keys=1)
        out_ids = fid[:, :k]
        out_d = fv[:, :k]
    if metric == DistanceType.InnerProduct:
        out_d = -out_d
    if metric == DistanceType.L2SqrtExpanded:
        out_d = jnp.where(jnp.isfinite(out_d), jnp.sqrt(jnp.maximum(out_d, 0.0)), out_d)
    return out_d, out_ids


@traced("cagra::search")
def search(
    index: Index,
    queries,
    k: int,
    params: Optional[SearchParams] = None,
    prefilter: Optional[filt.Prefilter] = None,
    seed: int = 0,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy beam search (search_single_cta_jit.cuh analog)."""
    if params is None:
        params = SearchParams(**kw)
    if prefilter is None:
        prefilter = filt.no_filter()
    queries = jnp.asarray(queries)
    nq = queries.shape[0]
    itopk = max(params.itopk_size, k)
    max_iter = params.max_iterations or max(10, itopk // max(params.search_width, 1) + 10)
    # visited ring: auto = cover every expansion the budget allows (so the
    # ring never wraps), capped at 256 slots of compare work per candidate;
    # visited_size=-1 turns the ring off (itopk-only dedup)
    vis_size = params.visited_size or min(256, max(
        32, 1 << (max_iter * params.search_width - 1).bit_length()))
    if params.visited_size < 0:
        vis_size = -1
    key = jax.random.PRNGKey(seed)

    chunk = int(min(params.query_chunk, max(8, nq)))
    outs_d, outs_i = [], []
    packed = isinstance(index, PackedIndex)
    for s in range(0, nq, chunk):
        q = queries[s : s + chunk]
        cur = q.shape[0]
        if cur < chunk:  # pad to the jitted chunk shape
            q = jnp.pad(q, ((0, chunk - cur), (0, 0)))
        qids = jnp.arange(s, s + chunk, dtype=jnp.int32)
        qids = jnp.minimum(qids, nq - 1)
        if packed:
            d, i = _search_chunk_packed(
                index.graph,
                index.child_vecs,
                index.child_norms,
                index.dataset_int8,
                index.dataset_norms,
                index.scale,
                q,
                qids,
                prefilter,
                jax.random.fold_in(key, s),
                int(k),
                int(itopk),
                int(params.search_width),
                int(max_iter),
                int(params.num_random_samplings),
                int(vis_size),
                index.metric,
                params.compute_dtype,
            )
            outs_d.append(d[:cur])
            outs_i.append(i[:cur])
            continue
        d, i = _search_chunk(
            index.data_pack,
            index.dataset_norms,
            index.graph,
            q,
            qids,
            prefilter,
            jax.random.fold_in(key, s),
            int(k),
            int(itopk),
            int(params.search_width),
            int(max_iter),
            int(params.num_random_samplings),
            int(vis_size),
            index.metric,
            params.compute_dtype,
        )
        outs_d.append(d[:cur])
        outs_i.append(i[:cur])
    return jnp.concatenate(outs_d, axis=0), jnp.concatenate(outs_i, axis=0)


@functools.partial(jax.jit, static_argnames=("max_ins", "metric"))
def _rank_insert_reverse(graph, dataset_f32, rows, ins_ids, ins_valid, max_ins,
                         metric=DistanceType.L2Expanded):
    """Rank-based reverse-edge insertion (add_nodes.cuh:24-96 semantics).

    For each affected row t (gathered uniquely into ``rows`` with up to
    ``max_ins`` candidate inserts): recompute the distances of t's current
    edges and the candidates, sort the combined list by the index metric,
    keep the best ``degree`` — a new node displaces existing edges only
    when it truly ranks above them, instead of unconditionally evicting
    the last slot.
    """
    deg = graph.shape[1]
    tvec = dataset_f32[rows]  # [R, d]
    cur = graph[rows]  # [R, deg]
    cand = jnp.concatenate([cur, jnp.where(ins_valid, ins_ids, 0)], axis=1)
    cvec = dataset_f32[cand]  # [R, deg+max_ins, d]
    if metric == DistanceType.InnerProduct:
        d2 = -jnp.einsum("rcd,rd->rc", cvec, tvec)  # min-space IP rank
    else:
        d2 = jnp.sum((cvec - tvec[:, None, :]) ** 2, axis=2)
    # invalid inserts and duplicate candidates rank last
    valid = jnp.concatenate(
        [jnp.ones(cur.shape, bool), ins_valid], axis=1
    )
    earlier = jnp.tril(jnp.ones((cand.shape[1], cand.shape[1]), bool), k=-1)
    dup = jnp.any(
        jnp.logical_and(cand[:, :, None] == cand[:, None, :], earlier[None]), axis=2
    )
    d2 = jnp.where(jnp.logical_and(valid, ~dup), d2, jnp.inf)
    order = jnp.argsort(d2, axis=1)[:, :deg]
    return jnp.take_along_axis(cand, order, axis=1)


def extend(index: Index, new_vectors, params: Optional[SearchParams] = None) -> Index:
    """Incremental insert (add_nodes.cuh:24 semantics).

    For each new node: CAGRA-search 2*degree neighbors, take the best
    ``degree`` as forward edges, then insert the node as a reverse edge
    into its nearest targets by DISTANCE RANK against those rows' existing
    edges (rank-based insertion, add_nodes.cuh:60-96) — repeated extends
    keep edge quality instead of eroding the tail slots.
    """
    new_vectors = jnp.asarray(new_vectors, index.dataset.dtype)
    deg = index.graph_degree
    n_old = index.size
    d, nbrs = search(
        index, jnp.asarray(new_vectors, jnp.float32), min(2 * deg, n_old), params
    )
    fwd = nbrs[:, :deg].astype(jnp.int32)
    n_new = new_vectors.shape[0]
    new_ids = jnp.arange(n_old, n_old + n_new, dtype=jnp.int32)
    dataset = jnp.concatenate([index.dataset, new_vectors], axis=0)

    # reverse edges: each new node offers itself to ALL its forward
    # targets; offers are grouped per target row and inserted by distance
    # rank in one batched pass — an offer worse than every existing edge
    # is rejected by the rank sort itself (add_nodes.cuh:60-96).
    rev_per = deg
    pairs_t = fwd[:, :rev_per].reshape(-1)  # target rows
    pairs_u = jnp.repeat(new_ids, rev_per)  # inserted ids
    rows, inv = jnp.unique(pairs_t, return_inverse=True, size=pairs_t.shape[0],
                           fill_value=-1)
    # slot each offer within its target row (stable two-pass grouping)
    order = jnp.argsort(inv, stable=True)
    inv_s = inv[order]
    first = jnp.concatenate([jnp.array([True]), inv_s[1:] != inv_s[:-1]])
    idx = jnp.arange(inv_s.shape[0], dtype=jnp.int32)
    group_start = lax.associative_scan(jnp.maximum, jnp.where(first, idx, 0))
    slot = idx - group_start
    max_ins = min(8, int(jnp.max(slot)) + 1)
    keep = slot < max_ins
    R = rows.shape[0]
    ins_ids = jnp.zeros((R, max_ins), jnp.int32).at[
        jnp.where(keep, inv_s, R), jnp.where(keep, slot, 0)
    ].set(pairs_u[order], mode="drop")
    ins_valid = jnp.zeros((R, max_ins), bool).at[
        jnp.where(keep, inv_s, R), jnp.where(keep, slot, 0)
    ].set(keep, mode="drop")
    ins_valid = jnp.logical_and(ins_valid, (rows >= 0)[:, None])

    safe_rows = jnp.maximum(rows, 0)
    graph_old = index.graph
    upd = _rank_insert_reverse(
        graph_old, jnp.asarray(dataset, jnp.float32), safe_rows, ins_ids,
        ins_valid, max_ins, index.metric,
    )
    graph_old = graph_old.at[jnp.where(rows >= 0, rows, graph_old.shape[0])].set(
        upd, mode="drop"
    )

    graph = jnp.concatenate([graph_old, fwd], axis=0)
    return from_graph(dataset, graph, metric=index.metric)


def merge(indexes, datasets=None, strategy: str = "physical", params: Optional[IndexParams] = None):
    """Merge CAGRA indexes (cagra.hpp:2477-2501 MergeStrategy).

    PHYSICAL rebuilds over the concatenated datasets; LOGICAL returns a
    composite view that searches every child and merges top-k.
    """
    from cuvs_tpu.neighbors import composite
    import sys

    mod = sys.modules[__name__]
    if strategy == "physical":
        data = jnp.concatenate([ix.dataset for ix in indexes], axis=0)
        return build(data, params) if params is not None else build(data)
    return composite.merge(mod, indexes, strategy="logical")


@dataclasses.dataclass(frozen=True)
class AceParams:
    """Mirrors cagra::ace_params (cagra.hpp:41-101): partitioned
    out-of-core builds for graphs larger than device memory."""

    npartitions: int = 4
    overlap: int = 2  # core + (overlap-1) halo partitions per point
    build_dir: Optional[str] = None  # spill the graph to disk (np.memmap)
    intermediate_graph_degree: int = 64
    graph_degree: int = 32
    seed: int = 0


def build_ace(dataset, params: Optional[AceParams] = None, **kw) -> Index:
    """ACE (Augmented Core Extraction) build (cagra_build.cuh:77-1028).

    Partition by balanced k-means; each partition's sub-graph is built over
    its core members plus halo members (points whose 2nd-nearest partition
    is this one), so edges near partition boundaries stay correct; only
    core rows are written to the global graph. Device memory holds one
    partition at a time; the global graph can live in a disk-backed memmap.
    """
    import numpy as np

    from cuvs_tpu.cluster import kmeans_balanced
    from cuvs_tpu.distance.pairwise import pairwise_distance

    if params is None:
        params = AceParams(**kw)
    x = np.asarray(dataset, np.float32)
    n, d = x.shape
    P = max(2, params.npartitions)
    deg = params.graph_degree

    centers = kmeans_balanced.fit(x, P, seed=params.seed)
    d2c = np.asarray(pairwise_distance(x, np.asarray(centers)))
    ranks = np.argsort(d2c, axis=1)[:, : params.overlap]  # [n, overlap]

    if params.build_dir:
        import os

        os.makedirs(params.build_dir, exist_ok=True)
        graph = np.lib.format.open_memmap(
            os.path.join(params.build_dir, "ace_graph.npy"),
            mode="w+", dtype=np.int32, shape=(n, deg),
        )
    else:
        graph = np.zeros((n, deg), np.int32)

    for p in range(P):
        core = np.where(ranks[:, 0] == p)[0]
        halo = np.where((ranks[:, 1:] == p).any(axis=1))[0]
        members = np.concatenate([core, halo])
        if len(members) <= deg:
            # degenerate tiny partition: connect within itself
            sub = np.resize(members, (len(core), deg))
            graph[core] = sub
            continue
        sub_index = build(
            x[members],
            IndexParams(
                intermediate_graph_degree=min(params.intermediate_graph_degree, len(members) - 1),
                graph_degree=min(deg, len(members) - 1),
                seed=params.seed,
            ),
        )
        sub_graph = np.asarray(sub_index.graph)  # local ids over `members`
        core_rows = sub_graph[: len(core)]
        remapped = members[core_rows]
        if remapped.shape[1] < deg:
            remapped = np.pad(remapped, ((0, 0), (0, deg - remapped.shape[1])), mode="edge")
        graph[core] = remapped
    if params.build_dir:
        graph.flush()
    return from_graph(jnp.asarray(x), np.asarray(graph))


def build_iterative(
    dataset,
    graph_degree: int = 32,
    intermediate_graph_degree: int = 64,
    n_rounds: int = 3,
    metric=DistanceType.L2Expanded,
    seed: int = 0,
) -> Index:
    """Iterative CAGRA build (cagra_build.cuh:2015 iterative-search path):
    bootstrap a weak graph, then repeatedly CAGRA-search every node's
    neighbors on the current graph and re-optimize. Useful when neither an
    exact self-search nor nn-descent fits memory/time budgets.
    """
    import numpy as np

    x = jnp.asarray(dataset)
    n = x.shape[0]
    ideg = min(intermediate_graph_degree, n - 1)
    gdeg = min(graph_degree, ideg)
    key = jax.random.PRNGKey(seed)

    # bootstrap: random regular graph, optimized once
    graph = jax.random.randint(key, (n, gdeg), 0, n).astype(jnp.int32)
    index = from_graph(x, graph, metric=metric)

    qf = jnp.asarray(x, jnp.float32)
    for r in range(n_rounds):
        # self-search: each node looks for its true neighbors via the
        # current (imperfect) graph; +1/-self like the exact builder
        d, nbrs = search(
            index, qf, min(ideg + 1, n - 1),
            itopk_size=max(2 * ideg, 64), seed=seed + r,
        )
        nbrs = jnp.asarray(nbrs, jnp.int32)
        rows = jnp.arange(n, dtype=jnp.int32)[:, None]
        dd = jnp.where(nbrs == rows, jnp.inf, jnp.asarray(d))
        order = jnp.argsort(dd, axis=1)[:, :ideg]
        knn = jnp.take_along_axis(nbrs, order, axis=1)
        graph = graph_core.optimize(knn, gdeg)
        index = from_graph(x, graph, metric=metric)
    return index
