"""Tests for nn_descent, vamana, and hnsw interop."""

import numpy as np
import pytest

from tests.utils import naive_knn, calc_recall

RNG = np.random.default_rng(83)


def _cloud(n, d):
    return (RNG.standard_normal((n, d)) * 2).astype(np.float32)


def test_nn_descent_graph_quality():
    from cuvs_tpu.neighbors import nn_descent

    x = _cloud(4000, 24)
    graph, dists = nn_descent.build(
        x, graph_degree=16, intermediate_graph_degree=32, max_iterations=15, seed=0
    )
    graph = np.asarray(graph)
    assert graph.shape == (4000, 16)
    gtd, gti = naive_knn(x, x, 17)
    gt = np.array([[j for j in row if j != i][:16] for i, row in enumerate(gti)])
    # per-row knn recall of the converged graph
    rec = np.mean([len(set(a) & set(b)) / 16 for a, b in zip(graph, gt)])
    assert rec >= 0.85, rec
    # distances are consistent
    sel = np.linalg.norm(x[:, None, :][:5] - x[np.asarray(graph)[:5]], axis=2) ** 2
    np.testing.assert_allclose(np.asarray(dists)[:5], sel, rtol=1e-2, atol=1e-2)


def test_nn_descent_block_local():
    """block_local=True reroutes through overlapping partition exact
    builds (the 4M+ auto path) — same output contract, recall holds."""
    from cuvs_tpu.neighbors import nn_descent

    x = _cloud(3000, 24)
    graph, dists = nn_descent.build(
        x, graph_degree=16, intermediate_graph_degree=32, seed=0,
        block_local=True,
    )
    graph = np.asarray(graph)
    assert graph.shape == (3000, 16)
    gtd, gti = naive_knn(x, x, 17)
    gt = np.array([[j for j in row if j != i][:16] for i, row in enumerate(gti)])
    rec = np.mean([len(set(a) & set(b)) / 16 for a, b in zip(graph, gt)])
    assert rec >= 0.85, rec
    assert not np.any(graph == np.arange(3000)[:, None])  # no self-loops


def test_nn_descent_feeds_cagra():
    from cuvs_tpu.neighbors import cagra, graph_core, nn_descent

    x = _cloud(4000, 16)
    q = _cloud(50, 16)
    graph, _ = nn_descent.build(
        x, graph_degree=32, intermediate_graph_degree=48, max_iterations=15, seed=0
    )
    pruned = graph_core.optimize(graph, 16)
    idx = cagra.from_graph(x, pruned)
    _, i = cagra.search(idx, q, 10, itopk_size=64)
    gtd, gti = naive_knn(q, x, 10)
    assert calc_recall(np.asarray(i), gti) >= 0.85


def test_vamana_build_and_search():
    from cuvs_tpu.neighbors import vamana

    x = _cloud(3000, 16)
    q = _cloud(30, 16)
    idx = vamana.build(x, graph_degree=24, visited_size=48, seed=0)
    assert idx.graph.shape == (3000, 24)
    d, i = vamana.search(idx, q, 10, itopk_size=64)
    gtd, gti = naive_knn(q, x, 10)
    rec = calc_recall(np.asarray(i), gti, np.asarray(d), gtd)
    assert rec >= 0.8, rec


def test_vamana_serialize_roundtrip(tmp_path):
    from cuvs_tpu.neighbors import vamana

    x = _cloud(500, 8)
    idx = vamana.build(x, graph_degree=12, visited_size=24, seed=0)
    p = str(tmp_path / "graph.diskann")
    vamana.serialize(idx, p)
    idx2 = vamana.deserialize(p, x)
    assert idx2.medoid == idx.medoid
    valid = idx.graph >= 0
    np.testing.assert_array_equal(idx.graph[valid], idx2.graph[: , : idx.graph.shape[1]][valid])


def test_vamana_rejects_corrupt_file(tmp_path):
    from cuvs_tpu.neighbors import vamana

    p = tmp_path / "bad.diskann"
    p.write_bytes(b"\x99" * 64)
    with pytest.raises(ValueError, match="corrupt"):
        vamana.deserialize(str(p), np.zeros((4, 2), np.float32))


def test_hnsw_roundtrip(tmp_path):
    from cuvs_tpu.neighbors import cagra, hnsw

    x = _cloud(2000, 16)
    q = _cloud(20, 16)
    idx = cagra.build(x, intermediate_graph_degree=32, graph_degree=17, seed=0)  # odd degree
    p = str(tmp_path / "index.hnsw")
    hnsw.from_cagra(idx, p)
    loaded = hnsw.load(p)
    assert loaded.size == 2000 and loaded.dim == 16
    np.testing.assert_array_equal(np.asarray(loaded.graph), np.asarray(idx.graph))
    np.testing.assert_allclose(np.asarray(loaded.dataset), x, rtol=1e-6)
    d, i = hnsw.search(loaded, q, 5, ef=64)
    gtd, gti = naive_knn(q, x, 5)
    assert calc_recall(np.asarray(i), gti) >= 0.9


def test_hnsw_cpu_hierarchy(tmp_path):
    """hierarchy="cpu" (hnsw.hpp:43-61): real hnswlib levels + upper-layer
    links, structurally valid for vanilla hnswlib descent."""
    from cuvs_tpu.neighbors import cagra, hnsw

    x = _cloud(3000, 16)
    idx = cagra.build(x, intermediate_graph_degree=32, graph_degree=16, seed=0)
    p = str(tmp_path / "h.hnsw")
    hnsw.from_cagra(idx, p, hnsw.HnswParams(hierarchy="cpu", seed=0))
    levels, maxlevel, enterpoint, links = hnsw.read_hierarchy(p)
    assert maxlevel >= 1  # 3000 nodes at mult=1/ln(8) gives several levels
    assert levels[enterpoint] == maxlevel
    # expected layer shrinkage: |level l| ~ n * exp(-l/mult)
    n1 = int((levels >= 1).sum())
    assert 0 < n1 < 3000
    for (node, l), ln in links.items():
        assert levels[node] >= l
        assert len(ln) > 0
        # upper-layer links must point to nodes present at that layer
        assert (levels[ln] >= l).all(), (node, l)
    # base layer unchanged: the file still loads as a CAGRA graph
    loaded = hnsw.load(p)
    np.testing.assert_array_equal(np.asarray(loaded.graph), np.asarray(idx.graph))


def test_hnsw_tpu_hierarchy(tmp_path):
    """hierarchy="tpu" (reference default HnswHierarchy::GPU,
    hnsw.hpp:46,51): per-level kNN computed on-device; must produce the
    same levels as the host path (same seed) and near-identical exact
    upper-layer links (tie order may differ)."""
    from cuvs_tpu.neighbors import cagra, hnsw

    x = _cloud(1500, 16)
    idx = cagra.build(x, intermediate_graph_degree=32, graph_degree=16, seed=0)
    pc = str(tmp_path / "c.hnsw")
    pt = str(tmp_path / "t.hnsw")
    hnsw.from_cagra(idx, pc, hnsw.HnswParams(hierarchy="cpu", seed=0))
    hnsw.from_cagra(idx, pt, hnsw.HnswParams(hierarchy="tpu", seed=0))
    lc, mlc, epc, linkc = hnsw.read_hierarchy(pc)
    lt, mlt, ept, linkt = hnsw.read_hierarchy(pt)
    np.testing.assert_array_equal(lc, lt)
    assert (mlc, epc) == (mlt, ept)
    assert linkc.keys() == linkt.keys()
    overlap = [
        len(set(linkc[k].tolist()) & set(linkt[k].tolist())) / len(linkc[k])
        for k in linkc
    ]
    assert np.mean(overlap) >= 0.95, np.mean(overlap)
    for (node, l), ln in linkt.items():
        assert lt[ln].min() >= l  # links stay within the layer


def test_hnsw_header_fields(tmp_path):
    import struct

    from cuvs_tpu.neighbors import cagra, hnsw

    x = _cloud(100, 8)
    idx = cagra.build(x, intermediate_graph_degree=16, graph_degree=8, seed=0)
    p = str(tmp_path / "i.hnsw")
    hnsw.from_cagra(idx, p)
    with open(p, "rb") as f:
        raw = f.read(96)
    offset0, max_el, count, spe, label_off, data_off = struct.unpack("<6Q", raw[:48])
    assert offset0 == 0 and max_el == 100 and count == 100
    maxlevel, enter = struct.unpack("<2i", raw[48:56])
    assert maxlevel == 1 and enter == 50
    maxm, maxm0, m = struct.unpack("<3Q", raw[56:80])
    assert maxm0 == 8 and m == 4
    # size_data_per_element = links(8*4+4) + data(8*4) + label(8)
    assert spe == 36 + 32 + 8
