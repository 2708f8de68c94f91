"""Vamana (DiskANN) graph build with batched inserts + robust prune.

Reference: ``cuvs::neighbors::vamana``
(/root/reference/cpp/include/cuvs/neighbors/vamana.hpp:59-76 —
graph_degree=32, visited_size=64, alpha=1.2, exponentially growing insert
batches capped at max_fraction=0.06 of n,
cpp/src/neighbors/detail/vamana/vamana_build.cuh:88-120; GreedySearchKernel
greedy_search.cuh:88; RobustPruneKernel robust_prune.cuh:56). Serializes
to the DiskANN graph format (vamana_serialize.cuh).

TPU-native: each insert batch runs the jitted CAGRA beam search over the
graph built so far (growing prefix → one recompile per batch, ~log(n)
batches); RobustPrune is a vectorized greedy loop over the fixed-size
candidate lists; reverse edges are sort-grouped scatters.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cuvs_tpu.distance import pairwise
from cuvs_tpu.distance.pairwise import DistanceType, normalize_metric


@dataclasses.dataclass(frozen=True)
class IndexParams:
    """Mirrors vamana::index_params (vamana.hpp:59-76)."""

    graph_degree: int = 32
    visited_size: int = 64
    alpha: float = 1.2
    max_fraction: float = 0.06
    metric: DistanceType = DistanceType.L2Expanded
    seed: int = 0

    def __post_init__(self):
        object.__setattr__(self, "metric", normalize_metric(self.metric))


@dataclasses.dataclass
class Index:
    dataset: np.ndarray
    graph: np.ndarray  # [n, graph_degree] int32, -1 padded
    medoid: int
    metric: DistanceType = DistanceType.L2Expanded

    @property
    def size(self):
        return self.dataset.shape[0]


def _robust_prune(cand_ids, cand_d, vectors, cand_vecs, alpha, R):
    """Vectorized RobustPrune (robust_prune.cuh:56).

    cand_ids/cand_d: [B, C] sorted by distance (−1/inf invalid);
    vectors: [B, d] the points being pruned for; cand_vecs: [B, C, d].
    Returns kept ids [B, R] (−1 padded).
    """
    B, C = cand_ids.shape

    # pairwise distances among candidates, [B, C, C]
    cn = jnp.sum(cand_vecs * cand_vecs, axis=2)
    dots = jnp.einsum("bcd,bed->bce", cand_vecs, cand_vecs,
                      precision=lax.Precision.HIGH)
    cc = jnp.maximum(cn[:, :, None] + cn[:, None, :] - 2.0 * dots, 0.0)

    def step(state, _):
        alive, kept, nk = state
        # pick the nearest alive candidate
        masked = jnp.where(alive, cand_d, jnp.inf)
        j = jnp.argmin(masked, axis=1)  # [B]
        ok = jnp.isfinite(jnp.take_along_axis(masked, j[:, None], axis=1)[:, 0])
        picked = jnp.where(ok, jnp.take_along_axis(cand_ids, j[:, None], axis=1)[:, 0], -1)
        kept = kept.at[jnp.arange(B), nk].set(picked)
        nk = nk + ok.astype(jnp.int32)
        # suppress candidates v with alpha * d(picked, v) <= d(p, v)
        d_pick = jnp.take_along_axis(cc, j[:, None, None], axis=1)[:, 0, :]  # [B, C]
        suppress = alpha * d_pick <= cand_d
        alive = alive & ~suppress
        alive = alive.at[jnp.arange(B), j].set(False)
        return (alive, kept, nk), None

    alive0 = jnp.isfinite(cand_d) & (cand_ids >= 0)
    kept0 = jnp.full((B, R), -1, jnp.int32)
    (alive, kept, _), _ = lax.scan(step, (alive0, kept0, jnp.zeros((B,), jnp.int32)),
                                   None, length=R)
    return kept


def build(dataset, params: Optional[IndexParams] = None, **kw) -> Index:
    if params is None:
        params = IndexParams(**kw)
    from cuvs_tpu.neighbors import cagra as cagra_mod

    x = np.asarray(dataset, np.float32)
    n, d = x.shape
    R = params.graph_degree
    L = params.visited_size
    xj = jnp.asarray(x)
    norms = pairwise.row_norms(xj)
    medoid = int(
        jnp.argmin(jnp.sum((xj - jnp.mean(xj, 0, keepdims=True)) ** 2, axis=1))
    )

    graph = np.full((n, R), -1, np.int32)
    # seed graph: first batch around the medoid, fully connected clique
    first = min(max(R + 1, 64), n)
    bf_d = np.array(pairwise.pairwise_distance(x[:first], x[:first]))  # writable copy
    np.fill_diagonal(bf_d, np.inf)
    m0 = min(R, first - 1)
    graph[:first, :m0] = np.argsort(bf_d, 1)[:, :m0]

    built = first
    batch = max(64, first)
    while built < n:
        batch = min(int(batch * 2), max(int(n * params.max_fraction), 256), n - built)
        ids = np.arange(built, built + batch)
        # greedy search over current prefix graph for candidates
        prefix = cagra_mod.from_graph(
            x[:built], np.where(graph[:built] >= 0, graph[:built], 0), metric=params.metric
        )
        cd, ci = cagra_mod.search(
            prefix, x[ids], min(L, built), itopk_size=max(L, R),
            max_iterations=max(16, L // 2), seed=params.seed,
        )
        cd = jnp.asarray(cd)
        ci = jnp.asarray(ci, jnp.int32)
        kept = _robust_prune(
            ci, cd, xj[ids], xj[jnp.maximum(ci, 0)], params.alpha, R
        )
        kept_np = np.asarray(kept)
        graph[ids] = kept_np

        # reverse edges: v gains an edge to each new node pointing at it;
        # vectorized via sorted grouping; per-target overflow replaces the
        # worst-rank slots (RobustPrune-lite, matching the reference's
        # reverse pass semantics)
        src = np.repeat(ids, R)
        dst = kept_np.reshape(-1)
        ok = dst >= 0
        src, dst = src[ok], dst[ok]
        order = np.argsort(dst, kind="stable")
        dst_s, src_s = dst[order], src[order]
        first = np.concatenate([[True], dst_s[1:] != dst_s[:-1]])
        group_start = np.maximum.accumulate(np.where(first, np.arange(len(dst_s)), 0))
        slot_rank = np.arange(len(dst_s)) - group_start
        free_count = (graph[dst_s] < 0).sum(1)
        # slot: next free slot if available, else replace from the tail
        n_slots = graph.shape[1]
        free_pos = n_slots - free_count  # index of first free slot
        tgt_slot = np.where(
            slot_rank < free_count,
            free_pos + slot_rank,
            n_slots - 1 - np.minimum(slot_rank - free_count, n_slots - 1),
        )
        # rows keep forward edges sorted first; compact free slots to the end
        row_sorted = np.sort(graph[dst_s], axis=1)[:, ::-1]  # valid first, -1 last
        graph[dst_s] = row_sorted
        graph[dst_s, tgt_slot] = src_s
        built += batch

    return Index(dataset=x, graph=graph, medoid=medoid, metric=params.metric)


def search(index: Index, queries, k: int, **kw) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy search over the Vamana graph (DiskANN-style serving)."""
    from cuvs_tpu.neighbors import cagra as cagra_mod

    g = np.where(index.graph >= 0, index.graph, 0)
    ix = cagra_mod.from_graph(index.dataset, g, metric=index.metric)
    return cagra_mod.search(ix, queries, k, **kw)


def serialize(index: Index, path: str) -> None:
    """DiskANN on-disk graph format (vamana_serialize.cuh):
    [u64 file_size][u32 max_degree][u32 medoid][u64 num_frozen]
    then per node: [u32 degree][degree x u32 neighbors]."""
    n, R = index.graph.shape
    degrees = (index.graph >= 0).sum(1).astype(np.uint32)
    blob = bytearray()
    blob += struct.pack("<QII Q", 0, int(degrees.max(initial=0)), index.medoid, 0)
    for i in range(n):
        deg = int(degrees[i])
        blob += struct.pack("<I", deg)
        blob += index.graph[i, :deg].astype(np.uint32).tobytes()
    struct.pack_into("<Q", blob, 0, len(blob))
    with open(path, "wb") as f:
        f.write(bytes(blob))


def deserialize(path: str, dataset, metric=DistanceType.L2Expanded) -> Index:
    x = np.asarray(dataset, np.float32)
    with open(path, "rb") as f:
        raw = f.read()
    size, max_deg, medoid, _ = struct.unpack_from("<QIIQ", raw, 0)
    if size != len(raw):
        raise ValueError("corrupt DiskANN graph file (size mismatch)")
    off = struct.calcsize("<QIIQ")
    n = x.shape[0]
    graph = np.full((n, max_deg), -1, np.int32)
    for i in range(n):
        (deg,) = struct.unpack_from("<I", raw, off)
        off += 4
        graph[i, :deg] = np.frombuffer(raw, np.uint32, deg, off)
        off += 4 * deg
    return Index(dataset=x, graph=graph, medoid=medoid, metric=normalize_metric(metric))
