import numpy as np
import pytest

from cuvs_tpu.neighbors import cagra, filters, graph_core, knn_graph
from tests.utils import naive_knn, calc_recall, make_blobs

RNG = np.random.default_rng(21)


def _data(n=10000, dim=32, nq=100):
    # CAGRA needs a *connected* knn graph: well-separated blob islands are
    # unreachable from random seeds (the reference addresses this with the
    # guarantee_connectivity MST option). Use one broad cloud, as real
    # embedding datasets are connected.
    x = (RNG.standard_normal((n, dim)) * 2.0).astype(np.float32)
    q = (RNG.standard_normal((nq, dim)) * 2.0).astype(np.float32)
    return x, q


def test_knn_graph_exact():
    x, _ = _data(2000, 16, 1)
    nbrs, dists = knn_graph.build_knn_graph(x, 8, algo="brute_force")
    gtd, gti = naive_knn(x, x, 9)
    # drop self column from ground truth
    gt = np.array([[j for j in row if j != i][:8] for i, row in enumerate(gti)])
    match = (np.asarray(nbrs) == gt).mean()
    assert match > 0.98, match
    nbrs_np = np.asarray(nbrs)
    assert not (nbrs_np == np.arange(2000)[:, None]).any(), "self edges remain"


def test_graph_optimize_shapes_and_validity():
    x, _ = _data(3000, 16, 1)
    nbrs, _ = knn_graph.build_knn_graph(x, 32, algo="brute_force")
    g = np.asarray(graph_core.optimize(nbrs, 16))
    assert g.shape == (3000, 16)
    assert (g >= 0).all() and (g < 3000).all()
    assert not (g == np.arange(3000)[:, None]).any(), "self edges"
    # rows have unique neighbors
    for r in RNG.integers(0, 3000, 20):
        assert len(set(g[r])) == 16


def test_detour_counts_small():
    # hand-built graph: node 0 -> [1, 2]; node 1 -> [2, 3]; edge 0->2 has a
    # detour through 1 (1 earlier in 0's list, 2 in 1's list)
    g = np.array([[1, 2], [2, 3], [3, 0], [0, 1]], np.int32)
    counts = np.asarray(graph_core._detour_counts(g, chunk=4))
    assert counts[0, 0] == 0  # first-rank edges never have detours
    assert counts[0, 1] == 1  # 0->2 detourable via 1


@pytest.mark.parametrize("build_algo", ["brute_force", "ivf_pq"])
def test_recall(build_algo):
    x, q = _data()
    idx = cagra.build(
        x, intermediate_graph_degree=64, graph_degree=32, build_algo=build_algo, seed=0
    )
    d, i = cagra.search(idx, q, 10, itopk_size=64)
    gtd, gti = naive_knn(q, x, 10)
    recall = calc_recall(np.asarray(i), gti, np.asarray(d), gtd)
    assert recall >= 0.9, (build_algo, recall)


def test_itopk_improves_recall():
    x, q = _data(8000, 32, 50)
    idx = cagra.build(x, intermediate_graph_degree=48, graph_degree=24, seed=0)
    gtd, gti = naive_knn(q, x, 10)
    r = {}
    for itopk in (16, 64, 128):
        _, i = cagra.search(idx, q, 10, itopk_size=itopk)
        r[itopk] = calc_recall(np.asarray(i), gti)
    assert r[128] >= r[16] - 0.02
    assert r[128] >= 0.9, r


def test_prefilter():
    x, q = _data(4000, 16, 20)
    keep = RNG.random(4000) > 0.3
    idx = cagra.build(x, intermediate_graph_degree=48, graph_degree=24, seed=0)
    d, i = cagra.search(idx, q, 10, prefilter=filters.from_mask(keep))
    i, d = np.asarray(i), np.asarray(d)
    valid = np.isfinite(d)
    assert keep[i[valid]].all()
    kept = np.where(keep)[0]
    gtd, gtl = naive_knn(q, x[kept], 10)
    assert calc_recall(i, kept[gtl]) >= 0.85


def test_no_duplicate_results():
    x, q = _data(3000, 16, 30)
    idx = cagra.build(x, intermediate_graph_degree=48, graph_degree=24, seed=0)
    _, i = cagra.search(idx, q, 10)
    i = np.asarray(i)
    for row in i:
        assert len(set(row.tolist())) == len(row), row


def test_from_graph_roundtrip():
    x, q = _data(2000, 16, 10)
    idx = cagra.build(x, intermediate_graph_degree=32, graph_degree=16, seed=0)
    idx2 = cagra.from_graph(x, np.asarray(idx.graph))
    d1, i1 = cagra.search(idx, q, 5)
    d2, i2 = cagra.search(idx2, q, 5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_extend():
    x, q = _data(5000, 16, 30)
    idx = cagra.build(x[:4000], intermediate_graph_degree=48, graph_degree=24, seed=0)
    idx = cagra.extend(idx, x[4000:])
    assert idx.size == 5000
    gtd, gti = naive_knn(q, x, 10)
    _, i = cagra.search(idx, q, 10, itopk_size=96)
    assert calc_recall(np.asarray(i), gti) >= 0.85
    # new nodes are findable: search for them exactly
    _, i2 = cagra.search(idx, x[4500:4510], 1, itopk_size=64)
    assert (np.asarray(i2).ravel() == np.arange(4500, 4510)).mean() >= 0.8


def test_extend_many_rounds_no_degradation():
    """10 extend rounds keep recall within a few % of a full rebuild
    (rank-based reverse insertion, add_nodes.cuh:24-96; the old
    replace-worst-slot heuristic erodes the graph here)."""
    x, q = _data(6000, 16, 40)
    idx = cagra.build(x[:3000], intermediate_graph_degree=48, graph_degree=24, seed=0)
    for r in range(10):
        idx = cagra.extend(idx, x[3000 + r * 300 : 3000 + (r + 1) * 300])
    assert idx.size == 6000
    rebuilt = cagra.build(x, intermediate_graph_degree=48, graph_degree=24, seed=0)
    gtd, gti = naive_knn(q, x, 10)
    _, i_ext = cagra.search(idx, q, 10, itopk_size=96)
    _, i_reb = cagra.search(rebuilt, q, 10, itopk_size=96)
    r_ext = calc_recall(np.asarray(i_ext), gti)
    r_reb = calc_recall(np.asarray(i_reb), gti)
    assert r_ext >= r_reb - 0.02, (r_ext, r_reb)


def test_guarantee_connectivity():
    """Adversarial islands: well-separated blobs produce a disconnected
    pruned graph; the MST-style augmentation must reconnect it
    (graph_core.cuh:487-644)."""
    blobs = []
    for c in range(4):
        center = np.zeros(16, np.float32)
        center[c] = 200.0
        blobs.append(center + RNG.standard_normal((500, 16)).astype(np.float32))
    x = np.concatenate(blobs)
    idx_off = cagra.build(x, intermediate_graph_degree=32, graph_degree=16, seed=0)
    lab_off = np.asarray(graph_core.connected_components(idx_off.graph))
    assert len(np.unique(lab_off)) > 1, "expected a disconnected baseline graph"
    idx_on = cagra.build(
        x, intermediate_graph_degree=32, graph_degree=16, seed=0,
        guarantee_connectivity=True,
    )
    lab_on = np.asarray(graph_core.connected_components(idx_on.graph))
    assert len(np.unique(lab_on)) == 1
    # cross-island queries now reachable from any seed
    q = x[::100] + 0.01
    _, i = cagra.search(idx_on, q, 1, itopk_size=64)
    hit = (np.asarray(i).ravel() == np.arange(0, 2000, 100)).mean()
    assert hit >= 0.9, hit


def test_ace_build(tmp_path):
    x, q = _data(6000, 16, 30)
    idx = cagra.build_ace(
        x, npartitions=3, intermediate_graph_degree=48, graph_degree=24,
        build_dir=str(tmp_path), seed=0,
    )
    assert idx.size == 6000 and idx.graph_degree == 24
    import os

    assert os.path.exists(str(tmp_path) + "/ace_graph.npy")  # disk spill
    gtd, gti = naive_knn(q, x, 10)
    _, i = cagra.search(idx, q, 10, itopk_size=96)
    rec = calc_recall(np.asarray(i), gti)
    assert rec >= 0.8, rec


def test_vpq_compressed_search():
    x, q = _data(6000, 32, 40)
    idx = cagra.build(x, intermediate_graph_degree=48, graph_degree=24, seed=0)
    comp = cagra.compress(idx, vq_n_centers=64, pq_dim=16, seed=0)
    # compressed storage is much smaller than the raw f32 dataset
    raw = idx.dataset.nbytes
    packed = comp.vq_codes.nbytes + comp.pq_codes.nbytes
    assert packed < raw / 4
    gtd, gti = naive_knn(q, x, 10)
    _, i = cagra.search(comp, q, 10, itopk_size=96)
    rec = calc_recall(np.asarray(i), gti)
    assert rec >= 0.7, rec  # lossy codes reduce recall; refine recovers it
    # refine against the raw dataset recovers accuracy
    from cuvs_tpu.neighbors import refine as rf

    _, cand = cagra.search(comp, q, 30, itopk_size=96)
    _, ri = rf.refine(x, q, cand, 10)
    assert calc_recall(np.asarray(ri), gti) >= 0.85


def test_iterative_build():
    x, q = _data(4000, 16, 30)
    idx = cagra.build_iterative(
        x, graph_degree=16, intermediate_graph_degree=32, n_rounds=3, seed=0
    )
    gtd, gti = naive_knn(q, x, 10)
    _, i = cagra.search(idx, q, 10, itopk_size=96)
    rec = calc_recall(np.asarray(i), gti)
    assert rec >= 0.8, rec


def test_packed_search_parity():
    """PackedIndex (gather-optimal int8 layout) tracks standard search."""
    rng = np.random.default_rng(11)
    x = make_blobs(rng, 15000, 48, n_centers=20)
    q = make_blobs(rng, 128, 48, n_centers=20)
    gtd, gti = naive_knn(q, x, 10)
    ix = cagra.build(x, intermediate_graph_degree=64, graph_degree=32)
    _, i0 = cagra.search(ix, q, 10, itopk_size=64)
    pk = cagra.pack(ix)
    d1, i1 = cagra.search(pk, q, 10, itopk_size=64)
    r0 = calc_recall(np.asarray(i0), gti)
    r1 = calc_recall(np.asarray(i1), gti)
    assert r1 >= r0 - 0.05, (r0, r1)
    # distances stay near-exact (int8 quantized children, f32 norms)
    true = ((q[:, None, :] - x[np.asarray(i1)]) ** 2).sum(-1)
    rel = np.abs(np.asarray(d1) - true) / np.maximum(true, 1e-6)
    assert np.median(rel) < 0.02


def test_pack_padded_tail():
    """pack() keeps gather-block padding rows in child_vecs (avoiding the
    [:n] slice that doubled the 8 GB array at 1M scale); search results
    are identical to an unpadded pack."""
    rng = np.random.default_rng(13)
    x = make_blobs(rng, 5000, 32, n_centers=10)
    q = make_blobs(rng, 64, 32, n_centers=10)
    ix = cagra.build(x, intermediate_graph_degree=48, graph_degree=24)
    pk0 = cagra.pack(ix)  # blk = n, no padding
    pk1 = cagra.pack(ix, _blk=1500)  # 4 blocks -> 1000 padded tail rows
    assert pk0.child_vecs[0].shape[0] == 5000
    assert pk1.child_vecs[0].shape[0] == 6000
    assert pk1.size == 5000
    d0, i0 = cagra.search(pk0, q, 10, itopk_size=64)
    d1, i1 = cagra.search(pk1, q, 10, itopk_size=64)
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
    assert np.allclose(np.asarray(d0), np.asarray(d1))


def test_pack_deg_axis_pieces():
    """A tiny _piece_bytes budget forces the multi-piece child_vecs split
    (the 16 GB-HBM path at reference degrees); results are identical to
    the single-piece pack, and the split round-trips through serialize."""
    rng = np.random.default_rng(14)
    x = make_blobs(rng, 5000, 32, n_centers=10)
    q = make_blobs(rng, 64, 32, n_centers=10)
    ix = cagra.build(x, intermediate_graph_degree=48, graph_degree=24)
    pk0 = cagra.pack(ix)
    pk3 = cagra.pack(ix, _piece_bytes=5000 * 32 * 8)  # deg_i=8 -> 3 pieces
    assert len(pk3.child_vecs) == 3
    assert sum(cv.shape[1] for cv in pk3.child_vecs) == 24
    d0, i0 = cagra.search(pk0, q, 10, itopk_size=64)
    d3, i3 = cagra.search(pk3, q, 10, itopk_size=64)
    assert np.array_equal(np.asarray(i0), np.asarray(i3))
    assert np.allclose(np.asarray(d0), np.asarray(d3))
    import tempfile

    from cuvs_tpu.utils import serialize as ser

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        ser.save(f.name, pk3)
        pk_l = ser.load(f.name)
    assert len(pk_l.child_vecs) == 3
    dl, il = cagra.search(pk_l, q, 10, itopk_size=64)
    assert np.array_equal(np.asarray(i3), np.asarray(il))


def test_packed_search_filtered():
    rng = np.random.default_rng(12)
    x = make_blobs(rng, 8000, 32, n_centers=10)
    q = make_blobs(rng, 64, 32, n_centers=10)
    ix = cagra.build(x, intermediate_graph_degree=32, graph_degree=16)
    pk = cagra.pack(ix)
    removed = np.zeros(8000, bool)
    removed[::2] = True  # filter out every even id
    pf = filters.from_mask(~removed)
    d, i = cagra.search(pk, q, 10, itopk_size=64, prefilter=pf)
    d, i = np.asarray(d), np.asarray(i)
    # slots beyond the filtered candidate pool are inf-padded (ids arbitrary)
    returned = np.isfinite(d)
    assert not np.any(i[returned] % 2 == 0), "filtered ids returned"
    assert returned.any()


def test_from_hnsw_params():
    """Heuristic mapping parity (cagra.hpp:118-147; cagra.cpp:34-56)."""
    p = cagra.IndexParams.from_hnsw_params(500_000, 96, 32, 200)
    # similar_search_performance: degree = 2 + 2M/3, intermediate = M + M*efc/256
    assert p.graph_degree == 2 + 2 * 32 // 3
    assert p.intermediate_graph_degree == 32 + 32 * 200 // 256
    assert p.build_algo == "nn_descent"
    assert p.nn_descent_params.max_iterations == 5 + 200 // 16

    p2 = cagra.IndexParams.from_hnsw_params(
        5_000_000, 96, 32, 128, heuristic="same_graph_footprint")
    assert p2.graph_degree == 64 and p2.intermediate_graph_degree == 96
    assert p2.build_algo == "ivf_pq" and p2.build_n_probes > 0

    import pytest as _pytest
    with _pytest.raises(ValueError):
        cagra.IndexParams.from_hnsw_params(1000, 8, 8, 64, heuristic="nope")


def test_from_hnsw_params_builds():
    rng = np.random.default_rng(17)
    x = make_blobs(rng, 3000, 24)
    q = make_blobs(rng, 32, 24)
    idx = cagra.build(x, cagra.IndexParams.from_hnsw_params(3000, 24, 12, 64))
    d, i = cagra.search(idx, q, 5, itopk_size=32)
    gtd, gti = naive_knn(q, x, 5)
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.8


def test_visited_ring_off():
    """visited_size=-1 disables the ring (itopk-only dedup, the cheaper
    pre-r4 behavior); results stay valid and near the ring-on recall, and
    no duplicates appear in the output."""
    x, q = _data(8000, 32, 50)
    idx = cagra.build(x, intermediate_graph_degree=48, graph_degree=24, seed=0)
    gtd, gti = naive_knn(q, x, 10)
    _, i_on = cagra.search(idx, q, 10, itopk_size=64, search_width=2)
    _, i_off = cagra.search(idx, q, 10, itopk_size=64, search_width=2,
                            visited_size=-1)
    r_on = calc_recall(np.asarray(i_on), gti)
    r_off = calc_recall(np.asarray(i_off), gti)
    assert r_off >= r_on - 0.05, (r_on, r_off)
    for row in np.asarray(i_off):
        assert len(set(row.tolist())) == len(row)
