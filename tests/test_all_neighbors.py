import numpy as np
import pytest

from cuvs_tpu.neighbors import all_neighbors, cagra
from tests.utils import naive_knn, calc_recall

RNG = np.random.default_rng(101)


def _cloud(n, d):
    return (RNG.standard_normal((n, d)) * 2).astype(np.float32)


def _graph_recall(graph, x, k):
    gtd, gti = naive_knn(x, x, k + 1)
    gt = np.array([[j for j in row if j != i][:k] for i, row in enumerate(gti)])
    return np.mean([len(set(a) & set(b)) / k for a, b in zip(np.asarray(graph), gt)])


def test_single_build():
    x = _cloud(3000, 16)
    g, d = all_neighbors.build(x, 8, algo="brute_force")
    assert _graph_recall(g, x, 8) >= 0.99


def test_batched_build():
    x = _cloud(6000, 16)
    g, d = all_neighbors.build(x, 8, algo="brute_force", n_clusters=4, overlap_factor=2)
    rec = _graph_recall(g, x, 8)
    assert rec >= 0.9, rec  # overlap=2 recovers most true neighbors


def test_batched_bad_overlap():
    with pytest.raises(ValueError):
        all_neighbors.AllNeighborsParams(n_clusters=2, overlap_factor=2)


def test_nn_descent_backend():
    x = _cloud(2000, 16)
    g, d = all_neighbors.build(x, 8, algo="nn_descent")
    assert _graph_recall(g, x, 8) >= 0.85


def test_cagra_merge_logical_and_physical():
    x = _cloud(4000, 16)
    q = _cloud(30, 16)
    a = cagra.build(x[:2000], intermediate_graph_degree=32, graph_degree=16, seed=0)
    b = cagra.build(x[2000:], intermediate_graph_degree=32, graph_degree=16, seed=0)
    gtd, gti = naive_knn(q, x, 10)

    comp = cagra.merge([a, b], strategy="logical")
    d, i = comp.search(q, 10, itopk_size=64)
    assert calc_recall(np.asarray(i), gti) >= 0.85

    phys = cagra.merge(
        [a, b],
        strategy="physical",
        params=cagra.IndexParams(intermediate_graph_degree=32, graph_degree=16, seed=0),
    )
    d2, i2 = cagra.search(phys, q, 10, itopk_size=64)
    assert calc_recall(np.asarray(i2), gti) >= 0.9
