import numpy as np
import pytest

from cuvs_tpu.cluster import kmeans, kmeans_balanced
from tests.utils import make_blobs

RNG = np.random.default_rng(5)


def _blob_data(n=2000, dim=16, n_centers=8):
    centers = RNG.standard_normal((n_centers, dim)) * 10.0
    labels = RNG.integers(0, n_centers, n)
    x = centers[labels] + RNG.standard_normal((n, dim)) * 0.5
    return x.astype(np.float32), labels, centers


def test_fit_recovers_blobs():
    x, true_labels, _ = _blob_data()
    centers, labels, inertia, n_iter = kmeans.fit(x, n_clusters=8, seed=1)
    labels = np.asarray(labels)
    # all points of a true cluster should map to one found cluster
    from collections import Counter

    purity = 0
    for c in range(8):
        members = labels[true_labels == c]
        purity += Counter(members).most_common(1)[0][1]
    assert purity / len(labels) > 0.95
    assert float(inertia) < 0.6 * 16 * len(labels)  # ~variance bound


def test_predict_matches_fit_labels():
    x, _, _ = _blob_data(500, 8, 4)
    centers, labels, _, _ = kmeans.fit(x, n_clusters=4, seed=2)
    pred = kmeans.predict(x, centers)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(labels))


def test_transform_shape_and_cost():
    x, _, _ = _blob_data(300, 8, 4)
    centers, _, inertia, _ = kmeans.fit(x, n_clusters=4, seed=0)
    t = np.asarray(kmeans.transform(x, centers))
    assert t.shape == (300, 4)
    cost = float(kmeans.cluster_cost(x, centers))
    np.testing.assert_allclose(cost, float(inertia), rtol=1e-4)
    np.testing.assert_allclose((t.min(1) ** 2).sum(), cost, rtol=1e-3)


def test_weighted_fit():
    x, _, _ = _blob_data(400, 4, 2)
    w = np.ones(400, np.float32)
    w[:200] = 100.0
    centers, _, _, _ = kmeans.fit(x, n_clusters=2, sample_weights=w, seed=0)
    assert np.isfinite(np.asarray(centers)).all()


def test_convergence_iterations():
    x, _, _ = _blob_data(1000, 8, 4)
    _, _, _, n_iter = kmeans.fit(x, n_clusters=4, max_iter=300, tol=1e-4, seed=0)
    assert int(n_iter) < 100  # easy blobs converge fast


def test_balanced_fit_balance():
    x = make_blobs(RNG, 20000, 32, n_centers=50)
    k = 64
    centers = kmeans_balanced.fit(x, k, n_iters=10, seed=0)
    assert centers.shape == (k, 32)
    labels = np.asarray(kmeans_balanced.predict(x, centers))
    counts = np.bincount(labels, minlength=k)
    assert counts.min() > 0, "no empty clusters"
    # balance: max list no more than ~6x the mean
    assert counts.max() < 6 * counts.mean(), counts.max() / counts.mean()


def test_balanced_more_clusters_than_points():
    x = make_blobs(RNG, 10, 4)
    centers = kmeans_balanced.fit(x, 16)
    assert centers.shape == (16, 4)


def test_find_k():
    x, _, _ = _blob_data(1000, 8, 4)
    best_k, centers, inertia = kmeans.find_k(x, kmax=16, kmin=2)
    assert 3 <= best_k <= 16


@pytest.mark.slow
def test_balanced_bounds_max_list():
    """Soft balancing must bound max_list/avg on clustered data
    (kmeans_balanced.cuh:645-810 balancing_em_iters semantics): the padded
    TPU scan window scales with the max list, so this is a perf invariant,
    not just quality."""
    from cuvs_tpu.cluster import kmeans_balanced

    rng = np.random.default_rng(11)
    # heavy-tailed blobs: a few dominant modes + background
    n, d, k = 80_000, 24, 256
    centers = rng.standard_normal((16, d)).astype(np.float32) * 3
    sizes = (np.array([0.4, 0.2, 0.1] + [0.3 / 13] * 13) * n).astype(int)
    sizes[-1] += n - sizes.sum()
    parts = [
        centers[i] + rng.standard_normal((s, d)).astype(np.float32)
        for i, s in enumerate(sizes)
    ]
    x = np.concatenate(parts, axis=0)

    c = kmeans_balanced.fit(x, k, kmeans_balanced.BalancedParams(
        n_clusters=k, n_iters=10, balancing_em_iters=5, seed=0))
    labels = np.asarray(kmeans_balanced.predict(x, c))
    counts = np.bincount(labels, minlength=k)
    ratio = counts.max() / (n / k)
    assert ratio <= 4.0, f"max_list/avg = {ratio:.2f}"
