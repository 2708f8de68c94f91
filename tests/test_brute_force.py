import numpy as np
import pytest

from cuvs_tpu.neighbors import brute_force, filters
from tests.utils import naive_knn, calc_recall, make_blobs

RNG = np.random.default_rng(3)


@pytest.mark.parametrize("metric", ["sqeuclidean", "euclidean", "inner_product", "cosine"])
@pytest.mark.parametrize("n,dim,nq,k", [(1000, 16, 25, 10), (5000, 64, 100, 32)])
def test_exact_knn(metric, n, dim, nq, k):
    x = make_blobs(RNG, n, dim)
    q = make_blobs(RNG, nq, dim)
    idx = brute_force.build(x, metric=metric)
    d, i = brute_force.search(idx, q, k)
    gtd, gti = naive_knn(q, x, k, metric=metric)
    recall = calc_recall(np.asarray(i), gti, np.asarray(d), gtd)
    assert recall >= 0.999, recall
    np.testing.assert_allclose(np.asarray(d), gtd, rtol=1e-3, atol=1e-3)


def test_tiling_invariance():
    x = make_blobs(RNG, 3000, 32)
    q = make_blobs(RNG, 64, 32)
    idx = brute_force.build(x)
    d1, i1 = brute_force.search(idx, q, 10, tile_size=256, query_chunk=16)
    d2, i2 = brute_force.search(idx, q, 10, tile_size=8192, query_chunk=64)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_long_tail_metric():
    x = make_blobs(RNG, 500, 8)
    q = make_blobs(RNG, 10, 8)
    idx = brute_force.build(x, metric="l1")
    d, i = brute_force.search(idx, q, 5)
    import scipy.spatial.distance as spd

    full = spd.cdist(q, x, "cityblock")
    gti = np.argsort(full, axis=1)[:, :5]
    assert (np.asarray(i) == gti).mean() > 0.98


def test_bitset_prefilter():
    x = make_blobs(RNG, 2000, 16)
    q = make_blobs(RNG, 20, 16)
    keep = RNG.random(2000) > 0.5
    idx = brute_force.build(x)
    d, i = brute_force.search(idx, q, 10, prefilter=filters.from_mask(keep))
    i = np.asarray(i)
    assert keep[i.ravel()].all()
    # equal to exact knn over the kept subset
    kept_ids = np.where(keep)[0]
    gtd, gti_local = naive_knn(q, x[kept_ids], 10)
    gti = kept_ids[gti_local]
    assert calc_recall(i, gti) >= 0.999


def test_bitmap_prefilter():
    x = make_blobs(RNG, 600, 16)
    q = make_blobs(RNG, 8, 16)
    mask = RNG.random((8, 600)) > 0.5
    idx = brute_force.build(x)
    d, i = brute_force.search(idx, q, 10, prefilter=filters.from_mask(mask))
    i = np.asarray(i)
    for r in range(8):
        assert mask[r, i[r]].all()


def test_udf_prefilter():
    x = make_blobs(RNG, 500, 16)
    q = make_blobs(RNG, 5, 16)
    idx = brute_force.build(x)
    flt = filters.udf_filter(lambda qid, sid: sid % 2 == 0)
    d, i = brute_force.search(idx, q, 10, prefilter=flt)
    assert (np.asarray(i) % 2 == 0).all()


def test_filter_excludes_everything_row():
    x = make_blobs(RNG, 100, 8)
    q = make_blobs(RNG, 2, 8)
    idx = brute_force.build(x)
    mask = np.zeros((2, 100), bool)
    mask[1, :5] = True  # row 0 excludes all
    d, i = brute_force.search(idx, q, 3, prefilter=filters.from_mask(mask))
    d = np.asarray(d)
    assert np.isinf(d[0]).all()
    assert np.isfinite(d[1]).all()


def test_half_dataset():
    x = make_blobs(RNG, 1000, 32).astype(np.float16)
    q = make_blobs(RNG, 10, 32).astype(np.float16)
    idx = brute_force.build(x)
    d, i = brute_force.search(idx, q, 10)
    gtd, gti = naive_knn(q.astype(np.float32), x.astype(np.float32), 10)
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.99


def test_int8_storage_with_refine():
    """int8-quantized scan (MXU int8 path) + exact refine ~ exact recall."""
    import jax.numpy as jnp

    from cuvs_tpu.neighbors import refine

    rng = np.random.default_rng(3)
    x = make_blobs(rng, 20000, 64, n_centers=50)
    q = make_blobs(rng, 200, 64, n_centers=50)
    gtd, gti = naive_knn(q, x, 10)
    idx8 = brute_force.build(x, storage_dtype=jnp.int8)
    assert idx8.dataset.dtype == jnp.int8 and idx8.q_scale is not None
    _, cand = brute_force.search(idx8, q, 40)
    _, ri = refine.refine(x, q, cand, 10)
    assert calc_recall(np.asarray(ri), gti) >= 0.99
