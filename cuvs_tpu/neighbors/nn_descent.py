"""NN-descent: iterative k-NN graph refinement.

Reference: ``cuvs::neighbors::nn_descent`` (GNND)
(/root/reference/cpp/include/cuvs/neighbors/nn_descent.hpp:61-76 —
graph_degree=64, intermediate_graph_degree=128, max_iterations=20,
termination_threshold=1e-4; impl cpp/src/neighbors/detail/nn_descent.cuh:
sampled new/old candidate lists, bloom-filter dedup, fused local-join
kernels :599/:871).

TPU-native reformulation: the CUDA local-join (pairwise distances among
each node's sampled candidates, scattered to both endpoints) is replaced
with **neighbor-of-neighbor expansion**: per iteration, every node gathers
a sample of its neighbors' neighbor lists, computes the candidate
distances as one batched MXU matmul, and merges into its sorted k-list.
Convergence behavior matches NN-descent (both exploit the "a neighbor of
my neighbor is likely my neighbor" closure); bookkeeping (bloom filters,
pinned host graphs) becomes dense dedup inside static-shape merges.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cuvs_tpu.distance import pairwise
from cuvs_tpu.distance.pairwise import DistanceType, normalize_metric


@dataclasses.dataclass(frozen=True)
class IndexParams:
    """Mirrors nn_descent::index_params (nn_descent.hpp:61-76)."""

    graph_degree: int = 64
    intermediate_graph_degree: int = 128
    max_iterations: int = 20
    termination_threshold: float = 1e-4
    metric: DistanceType = DistanceType.L2Expanded
    sample_per_node: int = 0  # 0 = auto (~2x degree)
    seed: int = 0

    def __post_init__(self):
        object.__setattr__(self, "metric", normalize_metric(self.metric))


@functools.partial(
    jax.jit, static_argnames=("K", "S", "chunk", "compute_dtype")
)
def _expand_round(key, dataset, norms, graph, graph_d, adj, K, S, chunk, compute_dtype):
    """One expansion round. graph/graph_d: [n, K] sorted by distance.

    ``adj`` [n, 2K] is the union of forward and reverse edges (built
    outside this program to keep each compile small) — the same
    information the reference's new/old local-join uses
    (nn_descent.cuh:599): a join between u's neighbors p, q updates both
    directions, which here corresponds to q reaching p through the
    reverse edge q<-u.
    """
    n, d = dataset.shape

    pad = (-n) % chunk
    gp = jnp.pad(graph, ((0, pad), (0, 0)))
    gdp = jnp.pad(graph_d, ((0, pad), (0, 0)), constant_values=jnp.inf)
    ap = jnp.pad(adj, ((0, pad), (0, 0)))
    rows = jnp.arange(n + pad, dtype=jnp.int32)

    def chunk_fn(args):
        gu, gdu, au, row, key_c = args
        B = gu.shape[0]
        # sample S slots out of the (2K)^2 two-hop candidates per node
        two_hop = adj[au].reshape(B, 4 * K * K)
        picks = jax.random.randint(key_c, (B, S), 0, 4 * K * K)
        cand = jnp.take_along_axis(two_hop, picks, axis=1)  # [B, S]
        # drop self and current neighbors
        self_hit = cand == row[:, None]
        in_graph = jnp.any(cand[:, :, None] == gu[:, None, :], axis=2)
        # dedup within candidates
        c_idx = jnp.argsort(cand, axis=1)
        c_sorted = jnp.take_along_axis(cand, c_idx, axis=1)
        dup_adj = jnp.concatenate(
            [jnp.zeros((B, 1), bool), c_sorted[:, 1:] == c_sorted[:, :-1]], axis=1
        )
        dup = jnp.zeros((B, S), bool).at[jnp.arange(B)[:, None], c_idx].set(dup_adj)
        invalid = self_hit | in_graph | dup

        q = dataset[row]
        vecs = dataset[cand]
        dots = lax.dot_general(
            q.astype(compute_dtype)[:, None, :],
            vecs.astype(compute_dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=pairwise.matmul_precision(compute_dtype),
        )[:, 0, :]
        cd = jnp.maximum(norms[row][:, None] + norms[cand] - 2.0 * dots, 0.0)
        cd = jnp.where(invalid, jnp.inf, cd)

        mv = jnp.concatenate([gdu, cd], axis=1)
        mi = jnp.concatenate([gu, cand], axis=1)
        tv, tl = lax.top_k(-mv, K)
        new_d = -tv
        new_i = jnp.take_along_axis(mi, tl, axis=1)
        changed = jnp.sum((new_i != gu).astype(jnp.float32))
        return new_i, new_d, changed

    keys = jax.random.split(key, (n + pad) // chunk)
    ni, nd, ch = lax.map(
        chunk_fn,
        (
            gp.reshape(-1, chunk, K),
            gdp.reshape(-1, chunk, K),
            ap.reshape(-1, chunk, 2 * K),
            rows.reshape(-1, chunk),
            keys,
        ),
    )
    return (
        ni.reshape(-1, K)[:n],
        nd.reshape(-1, K)[:n],
        jnp.sum(ch),
    )


def build(
    dataset, params: Optional[IndexParams] = None, chunk: int = 4096,
    compute_dtype=jnp.float32, block_local="auto", **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build the k-NN graph. Returns (graph [n, graph_degree], distances).

    The index is host/dense (nn_descent.hpp: host-memory dense graph).

    ``block_local`` ("auto" | True | False): at 4M+ rows the expansion
    rounds' scattered candidate gathers dominate (row-rate bound —
    docs/benchmarks.md hardware finding #1), so "auto" reroutes the build
    through the block-local join: overlapping balanced partitions with
    padded exact MXU self-searches (all_neighbors batched — the TPU
    reformulation of the reference's segmented GNND local join,
    nn_descent.cuh:599/871). Same output contract, strictly contiguous
    memory traffic. False forces the global expansion rounds at any size.
    """
    if params is None:
        params = IndexParams(**kw)
    dataset = jnp.asarray(dataset)
    n, d = dataset.shape
    if block_local == "auto":
        block_local = n >= 4_000_000
    if block_local and n > 4 * max(params.graph_degree, 1):
        from cuvs_tpu.neighbors import all_neighbors

        n_clusters = max(4, int(np.ceil(n / 500_000)))
        g, gd = all_neighbors.build(
            dataset,
            params.graph_degree,
            all_neighbors.AllNeighborsParams(
                n_clusters=n_clusters,
                overlap_factor=2,
                metric=params.metric,
                seed=params.seed,
            ),
        )
        return jnp.asarray(g, jnp.int32), jnp.asarray(gd)
    K = min(params.intermediate_graph_degree, n - 1)
    # coverage of the two-hop neighborhood per round governs convergence
    # speed; ~K^2 samples reaches >0.99 graph recall in <8 rounds
    S = params.sample_per_node or min(2048, max(16 * K, K * K))
    # bound the [chunk, S, d] candidate-vector gather (plus masks) to ~2 GB
    budget_rows = max(256, (2 * 1024**3) // max(S * d * 4, 1))
    chunk = 1 << (min(chunk, budget_rows).bit_length() - 1)
    chunk = min(chunk, max(8, n))
    norms = pairwise.row_norms(dataset)

    key = jax.random.PRNGKey(params.seed)
    k_init, key = jax.random.split(key)
    # random init graph + its distances (chunked: the [n, K, d] gather
    # would be tens of GB at 1M rows)
    graph = jax.random.randint(k_init, (n, K), 0, n).astype(jnp.int32)

    @functools.partial(jax.jit, static_argnames=("rows",))
    def _init_dists(dataset_f, graph, norms, rows):
        pad = (-graph.shape[0]) % rows
        gp = jnp.pad(graph, ((0, pad), (0, 0)))
        rp = jnp.pad(jnp.arange(graph.shape[0], dtype=jnp.int32), (0, pad))

        def chunk_fn(args):
            g, r = args
            dots = jnp.einsum(
                "nd,nkd->nk", dataset_f[r], dataset_f[g],
                precision=lax.Precision.HIGH,
            )
            d = jnp.maximum(norms[r][:, None] + norms[g] - 2.0 * dots, 0.0)
            return jnp.where(g == r[:, None], jnp.inf, d)

        out = lax.map(chunk_fn, (gp.reshape(-1, rows, K), rp.reshape(-1, rows)))
        return out.reshape(-1, K)[: graph.shape[0]]

    init_rows = max(256, min(n, (1 << 30) // max(K * d * 4, 1)))
    init_rows = 1 << (init_rows.bit_length() - 1)
    graph_d = _init_dists(jnp.asarray(dataset, jnp.float32), graph, norms, int(init_rows))
    order = jnp.argsort(graph_d, axis=1)
    graph = jnp.take_along_axis(graph, order, axis=1)
    graph_d = jnp.take_along_axis(graph_d, order, axis=1)

    from cuvs_tpu.neighbors.graph_core import _reverse_graph

    @jax.jit
    def _adjacency(graph):
        rev, rev_valid = _reverse_graph(graph, K)
        rows_all = jnp.arange(n, dtype=jnp.int32)
        rev = jnp.where(rev_valid, rev, rows_all[:, None])  # self = no-op
        return jnp.concatenate([graph, rev], axis=1)  # [n, 2K]

    total_slots = float(n * K)
    for it in range(params.max_iterations):
        key, k_it = jax.random.split(key)
        adj = _adjacency(graph)
        graph, graph_d, changed = _expand_round(
            k_it, dataset, norms, graph, graph_d, adj, K, S, chunk, compute_dtype
        )
        if float(changed) / total_slots < params.termination_threshold:
            break

    deg = min(params.graph_degree, K)
    return graph[:, :deg], graph_d[:, :deg]
