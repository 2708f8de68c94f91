import numpy as np

from cuvs_tpu.preprocessing import pca, quantize
from tests.utils import make_blobs

RNG = np.random.default_rng(55)


def test_scalar_roundtrip():
    x = make_blobs(RNG, 1000, 16)
    q = quantize.scalar_train(x)
    codes = quantize.scalar_transform(q, x)
    assert codes.dtype == np.int8
    back = np.asarray(quantize.scalar_inverse_transform(q, codes))
    # quantization error bounded by ~half a bin over the robust range
    rng_ = float(q.max_ - q.min_)
    inside = (x >= float(q.min_)) & (x <= float(q.max_))
    err = np.abs(back - x)[inside]
    assert err.max() <= rng_ / 255.0 * 1.01


def test_binary_thresholds():
    x = make_blobs(RNG, 500, 20)
    for mode in ("zero", "mean", "sampling_median"):
        q = quantize.binary_train(x, threshold=mode)
        codes = quantize.binary_transform(q, x)
        assert codes.shape == (500, 3)  # ceil(20/8)
        assert codes.dtype == np.uint8
    # zero threshold on positive data -> all bits of first 20 dims set
    q = quantize.binary_train(np.abs(x) + 1.0, threshold="zero")
    codes = np.asarray(quantize.binary_transform(q, np.abs(x) + 1.0))
    assert (codes[:, 0] == 0xFF).all()
    assert (codes[:, 2] == 0x0F).all()  # only 4 valid bits in last byte


def test_binary_hamming_search_pipeline():
    from cuvs_tpu.neighbors import brute_force
    from tests.utils import naive_knn, calc_recall

    x = make_blobs(RNG, 2000, 64)
    qr = x[:50] + RNG.standard_normal((50, 64)).astype(np.float32) * 0.05
    bq = quantize.binary_train(x, threshold="mean")
    xb = quantize.binary_transform(bq, x)
    qb = quantize.binary_transform(bq, qr)
    idx = brute_force.build(xb, metric="bitwise_hamming")
    d, i = brute_force.search(idx, qb, 5)
    # binary quantization is lossy; near-duplicate queries should still
    # retrieve their source row most of the time
    assert (np.asarray(i)[:, 0] == np.arange(50)).mean() >= 0.8


def test_pq_roundtrip_error():
    x = make_blobs(RNG, 3000, 32)
    q = quantize.pq_train(x, pq_dim=16, seed=0)
    codes = quantize.pq_transform(q, x)
    assert codes.shape == (3000, 16) and codes.dtype == np.uint8
    back = np.asarray(quantize.pq_inverse_transform(q, codes))
    assert back.shape == x.shape
    rel = np.linalg.norm(back - x) / np.linalg.norm(x)
    assert rel < 0.15, rel


def test_pca_roundtrip_and_variance():
    x = make_blobs(RNG, 2000, 16)
    p = pca.fit(x, 8)
    z = np.asarray(pca.transform(p, x))
    assert z.shape == (2000, 8)
    back = np.asarray(pca.inverse_transform(p, z))
    # top-8 PCs of 10-blob data capture nearly everything
    rel = np.linalg.norm(back - x) / np.linalg.norm(x)
    assert rel < 0.35
    ev = np.asarray(p.explained_variance)
    assert (np.diff(ev) <= 1e-3).all()  # descending
    # full-rank PCA is lossless
    pf = pca.fit(x, 16)
    backf = np.asarray(pca.inverse_transform(pf, pca.transform(pf, x)))
    np.testing.assert_allclose(backf, x, rtol=1e-3, atol=1e-3)


def test_vpq_roundtrip():
    from cuvs_tpu.preprocessing import quantize

    x = make_blobs(RNG, 3000, 32)
    q = quantize.vpq_train(x, vq_n_centers=64, pq_dim=16, seed=0)
    vq_codes, pq_codes = quantize.vpq_encode(q, x)
    assert pq_codes.shape == (3000, 16)
    back = np.asarray(quantize.vpq_decode(q, vq_codes, pq_codes))
    rel = np.linalg.norm(back - x) / np.linalg.norm(x)
    assert rel < 0.12, rel  # VQ+PQ beats plain PQ at equal code size
