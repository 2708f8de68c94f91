"""CAGRA graph optimization: detour-count pruning + reverse-edge merge.

Reference: /root/reference/cpp/src/neighbors/detail/cagra/graph_core.cuh —
``kern_sort`` (:77, neighbor lists by distance), fused detour-count prune
``kern_fused_prune`` (:206-330), ``kern_make_rev_graph`` (:178), merge
(:375). The CAGRA paper (arXiv:2308.15136) describes the rank-based detour
counting: edge u→v is detourable through w when w precedes v in u's list
and v appears in w's list — such edges are redundant 2-hop reachable.

TPU-native: detour counts are computed chunk-wise with a scan over
candidate ranks; membership tests against 2-hop lists are dense vectorized
compares on the VPU (no hash tables). Reverse-graph construction is a
sort-based grouped scatter (no atomics).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("chunk",))
def _detour_counts(graph: jnp.ndarray, chunk: int = 0) -> jnp.ndarray:
    """graph [n, K] (rank-sorted). Returns detour counts [n, K] int32.

    count[u, i] = |{ j < i : graph[u, i] ∈ graph[graph[u, j]] }|

    One flat compare block per chunk (no inner scan — long scans inside
    lax.map produce programs the remote TPU compiler chokes on); the
    [chunk, K, K, K] compare is pure VPU work that XLA fuses with its
    reduction, and chunk is sized to cap it at ~64 MB.
    """
    n, K = graph.shape
    if not chunk:
        chunk = max(8, min(1024, (1 << 26) // max(K ** 3, 1)))
    chunk = min(chunk, max(8, n))
    pad = (-n) % chunk
    gp = jnp.pad(graph, ((0, pad), (0, 0)))
    jlt = (
        jnp.arange(K, dtype=jnp.int32)[None, :, None]
        > jnp.arange(K, dtype=jnp.int32)[None, None, :]
    )  # [1, K(i), K(j)]: j < i

    def chunk_fn(gu):  # [chunk, K]
        two_hop = graph[gu]  # [chunk, K(j), K]
        member = jnp.any(
            gu[:, :, None, None] == two_hop[:, None, :, :], axis=3
        )  # [chunk, K(i), K(j)]
        return jnp.sum(jnp.logical_and(member, jlt).astype(jnp.int32), axis=2)

    counts = lax.map(chunk_fn, gp.reshape(-1, chunk, K))
    return counts.reshape(-1, K)[:n]


@functools.partial(jax.jit, static_argnames=("out_degree",))
def _prune_by_detour(graph: jnp.ndarray, counts: jnp.ndarray, out_degree: int):
    """Keep out_degree edges per node with smallest (detour count, rank)."""
    n, K = graph.shape
    # counts <= K, so count*K + rank fits int32 comfortably
    rank = jnp.arange(K, dtype=jnp.int32)[None, :]
    key = counts.astype(jnp.int32) * K + rank
    order = jnp.argsort(key, axis=1)[:, :out_degree]
    return jnp.take_along_axis(graph, order, axis=1)


@functools.partial(jax.jit, static_argnames=("rev_degree",))
def _reverse_graph(graph: jnp.ndarray, rev_degree: int):
    """Reverse edges grouped per head node, best (lowest) rank first.

    Returns (rev [n, rev_degree] int32, valid [n, rev_degree] bool).

    One ``lax.sort`` over the flat edge list, keys ``(dst, j*n + src)``
    (the second is rank-major and unique), then each head node GATHERS
    the first ``rev_degree`` entries of its segment — matching the
    (rank, src) lexicographic order of the reference's sorted atomic
    append (graph_core.cuh:178). Gather-only on purpose: the previous
    formulation (rev_degree scatter-min rounds under lax.scan) hit a
    reproducible TPU kernel fault at 1M x 64 (the 64M-update scatter),
    and the sort runs 0.8 s warm at that shape where the rounds took
    minutes at 100k-scale extrapolation.
    """
    n, D = graph.shape
    if n * D >= (1 << 31):
        raise ValueError("reverse graph too large for int32 keys; shard first")
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, D))
    key0 = jnp.arange(D, dtype=jnp.int32)[None, :] * n + src  # [n, D] unique
    dst_s, key_s = lax.sort((graph.reshape(-1), key0.reshape(-1)), num_keys=2)
    ids = jnp.arange(n, dtype=jnp.int32)
    start = jnp.searchsorted(dst_s, ids, side="left")
    end = jnp.searchsorted(dst_s, ids, side="right")
    pos = start[:, None] + jnp.arange(rev_degree, dtype=jnp.int32)[None, :]
    valid = pos < end[:, None]
    kk = key_s[jnp.clip(pos, 0, n * D - 1)]
    rev = jnp.where(valid, kk % n, -1)
    return rev, valid


@functools.partial(jax.jit, static_argnames=("out_degree",))
def _merge_fwd_rev(fwd: jnp.ndarray, rev: jnp.ndarray, rev_valid: jnp.ndarray, out_degree: int):
    """Interleave forward & reverse edges, dedup, keep out_degree.

    Mirrors kern_merge_graph (graph_core.cuh:375): the final list prefers
    forward edges by rank but injects reverse edges for connectivity.
    """
    n, Df = fwd.shape
    Dr = rev.shape[1]
    cand = jnp.concatenate([fwd, jnp.where(rev_valid, rev, -1)], axis=1)  # [n, Df+Dr]
    # priority: interleave fwd rank i -> 2i, rev rank j -> 2j+1
    pri = jnp.concatenate(
        [2 * jnp.arange(Df, dtype=jnp.int32), 2 * jnp.arange(Dr, dtype=jnp.int32) + 1]
    )[None, :]
    pri = jnp.broadcast_to(pri, cand.shape)
    invalid = cand < 0
    # dedup: lexicographic (id, pri) sort via two stable passes (no int64)
    C = cand.shape[1]
    cand_key = jnp.where(invalid, jnp.int32(1 << 30), cand)
    o1 = jnp.argsort(pri, axis=1, stable=True)
    cand_o1 = jnp.take_along_axis(cand_key, o1, axis=1)
    o2 = jnp.argsort(cand_o1, axis=1, stable=True)
    order = jnp.take_along_axis(o1, o2, axis=1)
    cand_s = jnp.take_along_axis(cand, order, axis=1)
    pri_s = jnp.take_along_axis(pri, order, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((n, 1), bool), cand_s[:, 1:] == cand_s[:, :-1]], axis=1
    )
    pri_s = jnp.where(jnp.logical_or(dup, cand_s < 0), jnp.int32(2 * C + 7), pri_s)
    keep_order = jnp.argsort(pri_s, axis=1)[:, :out_degree]
    out = jnp.take_along_axis(cand_s, keep_order, axis=1)
    # rows with fewer than out_degree unique candidates: fill from fwd
    out = jnp.where(out >= 0, out, fwd[:, :out_degree])
    return out


def optimize(
    knn_graph: jnp.ndarray,
    out_degree: int,
    detour_chunk: int = 0,  # 0 = auto-size to the VPU compare budget
    guarantee_connectivity: bool = False,
    dataset=None,
) -> jnp.ndarray:
    """CAGRA graph optimization (graph::optimize, cagra_build.cuh:1929).

    knn_graph: [n, K] neighbor ids sorted by distance (K = intermediate
    degree). Returns the pruned fixed-degree graph [n, out_degree].
    ``guarantee_connectivity`` runs the MST-style augmentation afterwards
    (graph_core.cuh:487-644); ``dataset`` lets it pick the shortest
    cross-component bridges instead of arbitrary ones.
    """
    knn_graph = jnp.asarray(knn_graph, jnp.int32)
    n, K = knn_graph.shape
    if out_degree > K:
        raise ValueError(f"out_degree {out_degree} > intermediate degree {K}")
    counts = _detour_counts(knn_graph, chunk=detour_chunk)
    fwd = _prune_by_detour(knn_graph, counts, out_degree)
    rev, rev_valid = _reverse_graph(fwd, out_degree)
    graph = _merge_fwd_rev(fwd, rev, rev_valid, out_degree)
    if guarantee_connectivity:
        graph = augment_connectivity(graph, dataset=dataset)
    return graph


@jax.jit
def connected_components(graph: jnp.ndarray) -> jnp.ndarray:
    """Component label per node of the UNDIRECTED view of ``graph``.

    Min-label propagation (pointer-jumping flavored): each step every node
    takes the min label over itself, its out-neighbors, and its in-edges
    (via scatter-min), then labels are path-compressed. Converges in
    O(log n) steps for graph diameter reduction; we run until fixpoint via
    a while_loop on "any label changed".
    """
    n, D = graph.shape
    init = jnp.arange(n, dtype=jnp.int32)

    def body(lab):
        nbr_min = jnp.min(lab[graph], axis=1)  # over out-edges
        new = jnp.minimum(lab, nbr_min)
        # in-edges: scatter-min of each node's label into its targets
        new = new.at[graph.reshape(-1)].min(jnp.repeat(lab, D))
        # path compression: follow labels one hop
        return jnp.minimum(new, new[new])

    def cond(state):
        lab, prev, it = state
        return jnp.logical_and(jnp.any(lab != prev), it < n)

    def step(state):
        lab, _, it = state
        return body(lab), lab, it + 1

    lab, _, _ = lax.while_loop(cond, step, (body(init), init, jnp.int32(0)))
    return lab


def augment_connectivity(graph: jnp.ndarray, dataset=None, max_rounds: int = 64) -> jnp.ndarray:
    """Ensure the graph is connected (cagra guarantee_connectivity,
    graph_core.cuh:487-644: MST over cross-component candidate edges).

    Each round: label components; every non-root component picks ONE
    bridge edge to a node outside itself (its shortest when ``dataset``
    distances are available, else its lowest-id candidate) and the bridge
    replaces the source row's last (worst-rank) slot. Rounds halve the
    component count at least (every component merges with another), so
    convergence takes O(log #components) rounds.
    """
    graph = jnp.asarray(graph, jnp.int32)
    n, D = graph.shape
    if dataset is not None:
        xf = jnp.asarray(dataset, jnp.float32)

    for _ in range(max_rounds):
        lab = connected_components(graph)
        n_comp = int(jnp.unique(lab).shape[0])
        if n_comp <= 1:
            break
        # candidate bridge for every node: nearest node of another component
        # among a strided sample (keeps it O(n * sample), not O(n^2))
        import numpy as np

        lab_h = np.asarray(lab)
        comp_ids, comp_index = np.unique(lab_h, return_inverse=True)
        # representative member per component (first occurrence)
        first = np.zeros(len(comp_ids), np.int64)
        seen = np.full(len(comp_ids), False)
        for i, c in enumerate(comp_index):
            if not seen[c]:
                seen[c] = True
                first[c] = i
        # connect every component to the largest one via its best bridge
        sizes = np.bincount(comp_index)
        root = int(np.argmax(sizes))
        graph_h = np.array(graph)  # writable host copy
        for c in range(len(comp_ids)):
            if c == root:
                continue
            members = np.where(comp_index == c)[0]
            others = np.where(comp_index == root)[0]
            # sample to bound cost
            ms = members[:: max(1, len(members) // 128)][:128]
            os_ = others[:: max(1, len(others) // 1024)][:1024]
            if dataset is not None:
                xm = np.asarray(xf[ms])
                xo = np.asarray(xf[os_])
                d2 = (
                    (xm * xm).sum(1)[:, None]
                    + (xo * xo).sum(1)[None, :]
                    - 2.0 * xm @ xo.T
                )
                mi, oi = np.unravel_index(np.argmin(d2), d2.shape)
                src, dst = int(ms[mi]), int(os_[oi])
            else:
                src, dst = int(ms[0]), int(os_[0])
            # bridge replaces the worst-rank slot, both directions
            graph_h[src, D - 1] = dst
            graph_h[dst, D - 1] = src
        graph = jnp.asarray(graph_h)
    return graph
