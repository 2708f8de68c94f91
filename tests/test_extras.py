"""Tests for stats, gram/KDE kernels, agglomerative, spectral, tiered,
composite, eps-neighborhood, and ball_cover."""

import numpy as np
import pytest

from tests.utils import naive_knn, calc_recall, make_blobs

RNG = np.random.default_rng(63)


def test_silhouette():
    from cuvs_tpu.stats import silhouette_score

    x = make_blobs(RNG, 600, 8, n_centers=3, scale=0.3)
    from cuvs_tpu.cluster import kmeans

    centers, labels, _, _ = kmeans.fit(x, n_clusters=3, seed=0)
    good = float(silhouette_score(x, labels, 3))
    bad = float(silhouette_score(x, np.asarray(labels)[::-1].copy(), 3))
    assert good > 0.7
    assert good > bad + 0.3


def test_trustworthiness():
    from cuvs_tpu.stats import trustworthiness_score

    x = make_blobs(RNG, 300, 16)
    perfect = float(trustworthiness_score(x, x.copy(), 5))
    noise = RNG.standard_normal((300, 2)).astype(np.float32)
    bad = float(trustworthiness_score(x, noise, 5))
    assert perfect > 0.999
    assert bad < 0.8


def test_gram_matrices():
    from cuvs_tpu.distance.kernels import gram_matrix, KernelType

    rng = np.random.default_rng(5)
    x = rng.standard_normal((20, 6)).astype(np.float32)
    y = rng.standard_normal((15, 6)).astype(np.float32)
    lin = np.asarray(gram_matrix(x, y, KernelType.LINEAR))
    np.testing.assert_allclose(lin, x @ y.T, rtol=1e-3, atol=1e-4)
    rbf = np.asarray(gram_matrix(x, y, KernelType.RBF, gamma=0.5))
    d2 = ((x[:, None] - y[None]) ** 2).sum(-1)
    np.testing.assert_allclose(rbf, np.exp(-0.5 * d2), rtol=1e-4, atol=1e-5)
    poly = np.asarray(gram_matrix(x, y, KernelType.POLYNOMIAL, gamma=2.0, coef0=1.0, degree=2))
    np.testing.assert_allclose(poly, (2 * x @ y.T + 1) ** 2, rtol=1e-3, atol=1e-3)
    th = np.asarray(gram_matrix(x, y, KernelType.TANH, gamma=0.1, coef0=0.2))
    np.testing.assert_allclose(th, np.tanh(0.1 * x @ y.T + 0.2), rtol=1e-3, atol=1e-5)


def test_kde():
    from cuvs_tpu.distance.kernels import kde, DensityKernelType

    samples = np.random.default_rng(6).standard_normal((2000, 2)).astype(np.float32)
    dense_pt = np.zeros((1, 2), np.float32)
    sparse_pt = np.full((1, 2), 4.0, np.float32)
    for kern in DensityKernelType:
        hi = float(kde(dense_pt, samples, bandwidth=1.0, kernel=kern)[0])
        lo = float(kde(sparse_pt, samples, bandwidth=1.0, kernel=kern)[0])
        assert hi > lo, kern


def test_boruvka_forest_matches_scipy_mst():
    """Device Borůvka (mst.cuh analog) must produce a spanning forest of
    the same total weight as scipy's MST over the symmetrized edge list."""
    import jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csg

    from cuvs_tpu.cluster.agglomerative import _boruvka_forest

    rng = np.random.default_rng(3)
    n, k = 500, 8
    x = rng.standard_normal((n, 3)).astype(np.float32)
    d = ((x[:, None, :] - x[None, :, :]) ** 2).sum(2)
    np.fill_diagonal(d, np.inf)
    nbrs = np.argsort(d, axis=1)[:, :k]
    w = np.take_along_axis(d, nbrs, axis=1)
    u = np.repeat(np.arange(n, dtype=np.int32), k)
    mask = np.asarray(_boruvka_forest(
        jnp.asarray(u), jnp.asarray(nbrs.reshape(-1), jnp.int32),
        jnp.asarray(w.reshape(-1), jnp.float32), n))
    got = float(w.reshape(-1)[mask].sum())
    g = sp.csr_matrix((w.reshape(-1), (u, nbrs.reshape(-1))), shape=(n, n))
    g = g.maximum(g.T)
    ncomp, _ = csg.connected_components(g, directed=False)
    exp = float(csg.minimum_spanning_tree(g).sum())
    assert mask.sum() == n - ncomp, (mask.sum(), n, ncomp)
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_single_linkage():
    from cuvs_tpu.cluster.agglomerative import single_linkage

    centers = np.array([[0, 0], [10, 10], [-10, 10]], np.float32)
    labels_true = RNG.integers(0, 3, 400)
    x = centers[labels_true] + RNG.standard_normal((400, 2)).astype(np.float32) * 0.3
    out = single_linkage(x, n_clusters=3)
    assert out.labels.shape == (400,)
    assert len(np.unique(out.labels)) == 3
    # perfect clustering on well-separated blobs
    from collections import Counter

    purity = sum(
        Counter(out.labels[labels_true == c]).most_common(1)[0][1] for c in range(3)
    )
    assert purity == 400
    assert out.dendrogram.shape[0] == 399
    assert (np.diff(out.distances) >= -1e-6).all()  # heights ascend


def test_spectral_clustering():
    from cuvs_tpu.cluster import spectral

    rng = np.random.default_rng(8)
    centers = np.array([[0, 0, 0], [8, 8, 8]], np.float32)
    labels_true = rng.integers(0, 2, 300)
    x = centers[labels_true] + rng.standard_normal((300, 3)).astype(np.float32) * 0.4
    labels, emb = spectral.fit_predict(x, 2, seed=0)
    labels = np.asarray(labels)
    agree = max((labels == labels_true).mean(), (labels != labels_true).mean())
    assert agree > 0.95, agree


def test_eps_neighborhood():
    from cuvs_tpu.neighbors.epsilon_neighborhood import eps_neighbors

    x = make_blobs(RNG, 300, 4)
    adj, deg = eps_neighbors(x[:50], x, 2.0)
    adj = np.asarray(adj)
    import scipy.spatial.distance as spd

    want = spd.cdist(x[:50], x) <= 2.0
    np.testing.assert_array_equal(adj, want)
    np.testing.assert_array_equal(np.asarray(deg), want.sum(1))


def test_ball_cover_exact():
    from cuvs_tpu.neighbors import ball_cover

    x = make_blobs(RNG, 4000, 16)
    q = make_blobs(RNG, 30, 16)
    idx = ball_cover.build(x, seed=0)
    d, i = ball_cover.knn_query(idx, q, 10)
    gtd, gti = naive_knn(q, x, 10, metric="euclidean")
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.999
    np.testing.assert_allclose(np.asarray(d), gtd, rtol=1e-3, atol=1e-3)


def test_ball_cover_eps_nn():
    from cuvs_tpu.neighbors import ball_cover

    x = make_blobs(RNG, 1000, 4)
    q = x[:20]
    idx = ball_cover.build(x, seed=0)
    adj, deg = ball_cover.eps_nn(idx, q, 1.5)
    import scipy.spatial.distance as spd

    want = spd.cdist(q, x) <= 1.5
    np.testing.assert_array_equal(np.asarray(adj), want)


def test_tiered_index():
    from cuvs_tpu.neighbors import ivf_flat, tiered_index

    x = make_blobs(RNG, 6000, 16)
    q = make_blobs(RNG, 30, 16)
    t = tiered_index.build(
        ivf_flat,
        dataset=x[:4000],
        ann_params=ivf_flat.IndexParams(n_lists=32, seed=0),
        min_ann_rows=1000,
    )
    assert t.ann_index is not None  # promoted immediately (4000 >= 1000)
    t = tiered_index.extend(t, x[4000:])  # lands in BF tier
    assert t.size == 6000
    d, i = tiered_index.search(t, q, 10, ann_kw=dict(n_probes=32))
    gtd, gti = naive_knn(q, x, 10)
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.95
    t = tiered_index.compact(t)
    assert t.bf_data is None and t.ann_rows == 6000
    d, i = tiered_index.search(t, q, 10, ann_kw=dict(n_probes=32))
    assert calc_recall(np.asarray(i), gti) >= 0.95


def test_composite_merge():
    from cuvs_tpu.neighbors import brute_force, composite

    x = make_blobs(RNG, 3000, 16)
    q = make_blobs(RNG, 20, 16)
    a = brute_force.build(x[:1000])
    b = brute_force.build(x[1000:])
    comp = composite.merge(brute_force, [a, b], strategy="logical")
    assert comp.size == 3000
    d, i = comp.search(q, 10)
    gtd, gti = naive_knn(q, x, 10)
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.999
    # physical merge
    phys = composite.merge(brute_force, [a, b], datasets=[x[:1000], x[1000:]],
                           strategy="physical")
    d2, i2 = brute_force.search(phys, q, 10)
    assert calc_recall(np.asarray(i2), gti) >= 0.999


def test_custom_udf_metric():
    import jax.numpy as jnp

    from cuvs_tpu.distance import pairwise_distance
    from cuvs_tpu.neighbors import brute_force

    def weighted_l1(x, y):
        w = jnp.arange(1, x.shape[1] + 1, dtype=jnp.float32)
        return jnp.sum(jnp.abs(x[:, None, :] - y[None, :, :]) * w, axis=-1)

    rng = np.random.default_rng(7)
    x = rng.standard_normal((200, 6)).astype(np.float32)
    q = rng.standard_normal((10, 6)).astype(np.float32)
    got = np.asarray(pairwise_distance(q, x, metric=weighted_l1))
    w = np.arange(1, 7, dtype=np.float32)
    want = (np.abs(q[:, None] - x[None]) * w).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    idx = brute_force.build(x, metric=weighted_l1)
    d, i = brute_force.search(idx, q, 5)
    gti = np.argsort(want, 1)[:, :5]
    assert (np.asarray(i) == gti).mean() > 0.98


def test_cross_component_nn():
    from cuvs_tpu.neighbors.cross_component import cross_component_nn

    rng = np.random.default_rng(8)
    a = rng.standard_normal((50, 4)).astype(np.float32)
    b = rng.standard_normal((60, 4)).astype(np.float32) + 10.0
    x = np.concatenate([a, b])
    comp = np.array([0] * 50 + [1] * 60)
    edges = cross_component_nn(x, comp)
    assert edges.shape == (2, 3)
    # edge 0: from component 0 into component 1 and vice versa
    assert comp[int(edges[0, 0])] == 0 and comp[int(edges[0, 1])] == 1
    assert comp[int(edges[1, 0])] == 1 and comp[int(edges[1, 1])] == 0
    # symmetric minimal edge => same distance both ways
    np.testing.assert_allclose(edges[0, 2], edges[1, 2], rtol=1e-5)
