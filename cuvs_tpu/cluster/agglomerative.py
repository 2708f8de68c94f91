"""Agglomerative (single-linkage) clustering via MST.

Reference: ``cuvs::cluster::agglomerative::single_linkage``
(/root/reference/cpp/include/cuvs/cluster/agglomerative.hpp:107;
build_dendrogram :251; MST cpp/src/cluster/detail/mst.cuh; connectivity
graphs detail/connectivities.cuh — the cuSLINK pipeline).

TPU-native split: the O(n^2 d) work — the k-NN connectivity graph and the
cross-component nearest-neighbor repair (``cross_component_nn``,
cpp/src/sparse/neighbors/cross_component_nn.cuh:68) — runs on the MXU;
the O(n log n) MST + dendrogram bookkeeping is host-side sparse graph
work (scipy csgraph), same division of labor as GPU HDBSCAN pipelines.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

from cuvs_tpu.neighbors import knn_graph as kg


@functools.partial(__import__("jax").jit, static_argnames=("n",))
def _boruvka_forest(u, v, w, n: int):
    """Borůvka minimum-spanning-forest over an edge list, on device.

    The cuSLINK MST analog (cpp/src/cluster/detail/mst.cuh): each round
    every component picks its minimum outgoing edge under the strict
    total order (weight, undirected edge id), unions merge via pointer
    jumping. Strict keys + symmetric adjacency guarantee the picked-edge
    functional graph has only 2-cycles, broken by the min-root rule.
    Returns a bool mask over the ORIGINAL (pre-symmetrized) edges.
    """
    import jax.numpy as jnp
    from jax import lax

    nE = u.shape[0]
    # symmetrize: reverse copies share the undirected id (eidx % nE)
    us = jnp.concatenate([u, v])
    vs = jnp.concatenate([v, u])
    ws = jnp.concatenate([w, w])
    uid = jnp.concatenate([jnp.arange(nE, dtype=jnp.int32)] * 2)
    INF = jnp.float32(jnp.inf)
    BIG = jnp.int32(2147483647)
    iota_n = jnp.arange(n, dtype=jnp.int32)
    jumps = max(1, int(np.ceil(np.log2(max(n, 2)))))

    def cond(st):
        _, _, changed = st
        return changed

    def body(st):
        comp, chosen, _ = st
        cu, cv = comp[us], comp[vs]
        valid = cu != cv
        wv = jnp.where(valid, ws, INF)
        wmin = jnp.full((n,), INF, jnp.float32).at[cu].min(wv)
        elig = jnp.logical_and(valid, wv <= wmin[cu])
        eid = jnp.where(elig, uid, BIG)
        pick = jnp.full((n,), BIG, jnp.int32).at[cu].min(eid)
        has = pick < BIG
        chosen = chosen.at[jnp.where(has, pick, 0)].max(has)
        # union roots along picked edges (comp labels ARE roots here).
        # Each root slot links ITSELF to the edge's other endpoint —
        # elementwise, no scatter collisions even when the root picked
        # the reversed copy of the edge
        safe = jnp.where(has, pick, 0)
        other = comp[u[safe]] + comp[v[safe]] - iota_n
        parent = jnp.where(has, other, iota_n)
        # 2-cycle break: mutual pairs keep the smaller id as root
        pp = parent[parent]
        parent = jnp.where(
            jnp.logical_and(pp == iota_n, iota_n < parent), iota_n, parent)
        for _ in range(jumps):  # full path compression
            parent = parent[parent]
        return parent[comp], chosen, jnp.any(has)

    comp0 = iota_n
    chosen0 = jnp.zeros((nE,), bool)
    _, chosen, _ = lax.while_loop(cond, body, (comp0, chosen0, jnp.bool_(True)))
    return chosen


@dataclasses.dataclass
class SingleLinkageOutput:
    """Mirrors the reference output: dendrogram + flat labels."""

    labels: np.ndarray  # [n]
    dendrogram: np.ndarray  # [n-1, 2] merged cluster ids (scipy linkage style)
    distances: np.ndarray  # [n-1] merge heights
    sizes: np.ndarray  # [n-1] merged cluster sizes


def _mst_edges(x, n_neighbors: int, metric) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """MST over the knn connectivity graph, repaired to full connectivity.

    The O(n·k) Borůvka forest runs on device (_boruvka_forest, the
    cuSLINK mst.cuh analog); the host only sees the ≤ n-1 forest edges
    plus repair edges — the scipy MST below is over that tiny graph, not
    the full knn edge list.
    """
    import jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csg

    n = x.shape[0]
    k = min(n_neighbors, n - 1)
    nbrs, dists = kg.build_knn_graph(x, k, metric=metric)
    u = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    v = jnp.asarray(nbrs, jnp.int32).reshape(-1)
    w = jnp.maximum(jnp.asarray(dists, jnp.float32).reshape(-1), 1e-30)
    mask = np.asarray(_boruvka_forest(u, v, w, n))
    fu, fv, fw = (np.asarray(u)[mask], np.asarray(v)[mask],
                  np.asarray(w)[mask])
    graph = sp.csr_matrix((fw, (fu, fv)), shape=(n, n))
    graph = graph.maximum(graph.T)

    # repair connectivity: add the nearest cross-component edge per round
    # (cross_component_nn analog, computed exactly with the MXU)
    from cuvs_tpu.neighbors import brute_force as bf

    for _ in range(64):  # bounded repair rounds
        n_comp, comp = csg.connected_components(graph, directed=False)
        if n_comp == 1:
            break
        # connect smallest component to its nearest outside point
        sizes = np.bincount(comp)
        c = int(np.argmin(sizes))
        inside = np.where(comp == c)[0]
        outside = np.where(comp != c)[0]
        index = bf.build(np.asarray(x)[outside], metric=metric)
        dd, ii = bf.search(index, np.asarray(x)[inside], 1)
        dd = np.asarray(dd)[:, 0]
        jj = outside[np.asarray(ii)[:, 0]]
        best = int(np.argmin(dd))
        u, v, w = inside[best], jj[best], max(float(dd[best]), 1e-30)
        graph[u, v] = w
        graph[v, u] = w
    mst = csg.minimum_spanning_tree(graph)
    coo = mst.tocoo()
    return coo.row, coo.col, coo.data


def single_linkage(
    x,
    n_clusters: int = 2,
    metric="euclidean",
    n_neighbors: int = 15,
) -> SingleLinkageOutput:
    """Single-linkage clustering (agglomerative.hpp:107 semantics)."""
    x = np.asarray(x, np.float32)
    n = x.shape[0]
    if not (1 <= n_clusters <= n):
        raise ValueError("n_clusters out of range")
    u, v, w = _mst_edges(x, n_neighbors, metric)
    order = np.argsort(w, kind="stable")
    u, v, w = u[order], v[order], w[order]

    # union-find dendrogram build (build_dendrogram :251)
    parent = np.arange(2 * n - 1, dtype=np.int64)
    cluster_of = np.arange(n, dtype=np.int64)
    size = np.ones(2 * n - 1, np.int64)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    children = np.zeros((n - 1, 2), np.int64)
    heights = np.zeros(n - 1, np.float32)
    merged_sizes = np.zeros(n - 1, np.int64)
    next_id = n
    m = 0
    for e in range(len(w)):
        ra, rb = find(u[e]), find(v[e])
        if ra == rb:
            continue
        ca, cb = cluster_of[ra], cluster_of[rb]
        children[m] = (min(ca, cb), max(ca, cb))
        heights[m] = w[e]
        new_size = size[ca] + size[cb]
        merged_sizes[m] = new_size
        parent[ra] = rb
        root = find(rb)
        cluster_of[root] = next_id
        size[next_id] = new_size
        next_id += 1
        m += 1
        if m == n - 1:
            break

    # flat labels: undo the last (n_clusters - 1) merges
    cut = max(0, m - (n_clusters - 1))
    lab_parent = np.arange(n, dtype=np.int64)

    def lfind(a):
        while lab_parent[a] != a:
            lab_parent[a] = lab_parent[lab_parent[a]]
            a = lab_parent[a]
        return a

    # replay merges below the cut on the original points
    parent2 = np.arange(n, dtype=np.int64)

    def find2(a):
        while parent2[a] != a:
            parent2[a] = parent2[parent2[a]]
            a = parent2[a]
        return a

    cnt = 0
    for e in range(len(w)):
        if cnt >= cut:
            break
        ra, rb = find2(u[e]), find2(v[e])
        if ra == rb:
            continue
        parent2[ra] = rb
        cnt += 1
    roots = np.array([find2(i) for i in range(n)])
    _, labels = np.unique(roots, return_inverse=True)
    return SingleLinkageOutput(
        labels=labels.astype(np.int32),
        dendrogram=children[:m],
        distances=heights[:m],
        sizes=merged_sizes[:m],
    )
