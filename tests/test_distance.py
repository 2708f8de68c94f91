import numpy as np
import pytest
import scipy.spatial.distance as spd

from cuvs_tpu.distance import pairwise_distance, fused_l2_argmin, DistanceType


RNG = np.random.default_rng(42)
X = RNG.random((37, 19)).astype(np.float32) + 0.01
Y = RNG.random((53, 19)).astype(np.float32) + 0.01
# probability rows for JSD/KL/Hellinger
XP = (X / X.sum(1, keepdims=True)).astype(np.float32)
YP = (Y / Y.sum(1, keepdims=True)).astype(np.float32)


SCIPY_CASES = [
    ("sqeuclidean", "sqeuclidean", X, Y, {}),
    ("euclidean", "euclidean", X, Y, {}),
    ("cosine", "cosine", X, Y, {}),
    ("l1", "cityblock", X, Y, {}),
    ("chebyshev", "chebyshev", X, Y, {}),
    ("canberra", "canberra", X, Y, {}),
    ("correlation", "correlation", X, Y, {}),
    ("braycurtis", "braycurtis", X, Y, {}),
    ("minkowski", "minkowski", X, Y, {"p": 3.0}),
    ("jensenshannon", "jensenshannon", XP, YP, {}),
]


@pytest.mark.parametrize("ours,scipy_name,x,y,kw", SCIPY_CASES)
def test_vs_scipy(ours, scipy_name, x, y, kw):
    got = np.asarray(pairwise_distance(x, y, metric=ours, **kw))
    want = spd.cdist(x, y, scipy_name, **kw)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_inner_product():
    got = np.asarray(pairwise_distance(X, Y, metric="inner_product"))
    np.testing.assert_allclose(got, X @ Y.T, rtol=1e-5)


def test_hellinger():
    got = np.asarray(pairwise_distance(XP, YP, metric="hellinger"))
    want = np.sqrt(
        np.maximum(1.0 - np.sqrt(XP) @ np.sqrt(YP).T, 0.0)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_kl_divergence():
    got = np.asarray(pairwise_distance(XP, YP, metric="kl_divergence"))
    want = np.array(
        [[np.sum(a * np.log(a / b)) for b in YP] for a in XP]
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_hamming():
    xb = (X > 0.5).astype(np.float32)
    yb = (Y > 0.5).astype(np.float32)
    got = np.asarray(pairwise_distance(xb, yb, metric="hamming"))
    want = spd.cdist(xb, yb, "hamming")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bitwise_hamming():
    xb = RNG.integers(0, 256, (10, 16)).astype(np.uint8)
    yb = RNG.integers(0, 256, (12, 16)).astype(np.uint8)
    got = np.asarray(pairwise_distance(xb, yb, metric="bitwise_hamming"))
    want = np.array(
        [
            [bin(int.from_bytes((a ^ b).tobytes(), "big")).count("1") for b in yb]
            for a in xb
        ],
        dtype=np.float32,
    )
    np.testing.assert_allclose(got, want)


def test_haversine():
    pts1 = (RNG.random((5, 2)) - 0.5) * np.array([np.pi, 2 * np.pi])
    pts2 = (RNG.random((7, 2)) - 0.5) * np.array([np.pi, 2 * np.pi])
    got = np.asarray(pairwise_distance(pts1, pts2, metric="haversine"))
    lat1, lon1 = pts1[:, None, 0], pts1[:, None, 1]
    lat2, lon2 = pts2[None, :, 0], pts2[None, :, 1]
    a = (
        np.sin((lat2 - lat1) / 2) ** 2
        + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2
    )
    want = 2 * np.arcsin(np.sqrt(a))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_unexpanded_l2_matches_expanded():
    a = np.asarray(pairwise_distance(X, Y, metric=DistanceType.L2Unexpanded))
    b = np.asarray(pairwise_distance(X, Y, metric=DistanceType.L2Expanded))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_row_tiling_consistency():
    big = RNG.random((1000, 32)).astype(np.float32)
    other = RNG.random((53, 32)).astype(np.float32)
    small_tile = np.asarray(pairwise_distance(big, other, metric="l1", row_tile=64))
    one_shot = np.asarray(pairwise_distance(big, other, metric="l1", row_tile=1024))
    np.testing.assert_allclose(small_tile, one_shot, rtol=1e-6)


def test_fused_l2_argmin():
    labels, dists = fused_l2_argmin(X, Y)
    full = spd.cdist(X, Y, "sqeuclidean")
    np.testing.assert_array_equal(np.asarray(labels), full.argmin(1))
    np.testing.assert_allclose(np.asarray(dists), full.min(1), rtol=1e-4, atol=1e-5)


def test_fused_l2_argmin_tiled():
    big = RNG.random((5000, 24)).astype(np.float32)
    cents = RNG.random((100, 24)).astype(np.float32)
    labels, _ = fused_l2_argmin(big, cents, row_tile=512)
    full = spd.cdist(big, cents, "sqeuclidean")
    assert (np.asarray(labels) == full.argmin(1)).mean() > 0.999
