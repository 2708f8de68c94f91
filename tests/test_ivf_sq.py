import numpy as np

from cuvs_tpu.neighbors import ivf_sq, filters
from tests.utils import naive_knn, calc_recall, make_blobs

RNG = np.random.default_rng(77)


def test_recall():
    x = make_blobs(RNG, 20000, 32, n_centers=100)
    q = make_blobs(RNG, 100, 32, n_centers=100)
    idx = ivf_sq.build(x, n_lists=64, seed=0)
    d, i = ivf_sq.search(idx, q, 10, n_probes=32)
    gtd, gti = naive_knn(q, x, 10)
    recall = calc_recall(np.asarray(i), gti, np.asarray(d), gtd)
    assert recall >= 0.85, recall


def test_full_probe_near_exact():
    x = make_blobs(RNG, 5000, 16)
    q = make_blobs(RNG, 50, 16)
    idx = ivf_sq.build(x, n_lists=32, seed=0)
    d, i = ivf_sq.search(idx, q, 10, n_probes=32)
    gtd, gti = naive_knn(q, x, 10)
    # int8 quantization bounds the error; recall should be near exact
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.95
    # distances approximate the true ones
    np.testing.assert_allclose(np.asarray(d), gtd, rtol=0.1, atol=0.5)


def test_storage_is_int8():
    x = make_blobs(RNG, 1000, 16)
    idx = ivf_sq.build(x, n_lists=8, seed=0)
    assert idx.sorted_codes.dtype == np.int8


def test_prefilter():
    x = make_blobs(RNG, 3000, 16)
    q = make_blobs(RNG, 10, 16)
    keep = RNG.random(3000) > 0.5
    idx = ivf_sq.build(x, n_lists=16, seed=0)
    d, i = ivf_sq.search(idx, q, 10, n_probes=16, prefilter=filters.from_mask(keep))
    i, d = np.asarray(i), np.asarray(d)
    assert keep[i[np.isfinite(d)]].all()
