import numpy as np
import pytest

from cuvs_tpu.core import bitpack
from cuvs_tpu.neighbors import ivf_rabitq, refine, filters
from tests.utils import naive_knn, calc_recall, make_blobs

RNG = np.random.default_rng(131)


def test_recall_with_refine():
    x = make_blobs(RNG, 20000, 64, n_centers=100)
    q = make_blobs(RNG, 100, 64, n_centers=100)
    idx = ivf_rabitq.build(x, n_lists=64, bits_per_dim=3, seed=0)
    _, cand = ivf_rabitq.search(idx, q, 40, n_probes=32)
    rd, ri = refine.refine(x, q, cand, 10)
    gtd, gti = naive_knn(q, x, 10)
    rec = calc_recall(np.asarray(ri), gti)
    assert rec >= 0.9, rec


def test_bits_tradeoff():
    x = make_blobs(RNG, 10000, 32)
    q = make_blobs(RNG, 64, 32)
    gtd, gti = naive_knn(q, x, 10)
    recalls = {}
    for bits in (1, 4, 8):
        idx = ivf_rabitq.build(x, n_lists=32, bits_per_dim=bits, seed=0)
        _, i = ivf_rabitq.search(idx, q, 10, n_probes=32)
        recalls[bits] = calc_recall(np.asarray(i), gti)
    assert recalls[8] >= recalls[4] >= recalls[1] - 0.05, recalls
    assert recalls[8] >= 0.85, recalls


def test_one_bit_works():
    # the classic RaBitQ regime: 1 bit/dim + a large refine pool (the
    # 1-bit estimator's error is ~1/sqrt(D), so at D=64 the rerank pool
    # must be deep — same trade-off as the reference)
    x = make_blobs(RNG, 20000, 64, n_centers=100)
    q = make_blobs(RNG, 100, 64, n_centers=100)
    idx = ivf_rabitq.build(x, n_lists=64, bits_per_dim=1, seed=0)
    _, cand = ivf_rabitq.search(idx, q, 256, n_probes=32)
    rd, ri = refine.refine(x, q, cand, 10)
    gtd, gti = naive_knn(q, x, 10)
    rec = calc_recall(np.asarray(ri), gti)
    assert rec >= 0.8, rec


def test_estimator_unbiased():
    """The signed error of the RaBitQ L2 estimate must be centred near 0
    (the whole point of the unbiased estimator — a scalar-quantizer stand-in
    would have a systematic bias).

    Scores EVERY row (k = n): returning only the top-k would condition on
    low estimates and read as a spurious negative bias (winner's curse).
    Own RNG so the data is independent of which other tests ran.
    """
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    x = make_blobs(rng, 4000, 48)
    q = make_blobs(rng, 32, 48)
    idx = ivf_rabitq.build(x, n_lists=1, bits_per_dim=3, kmeans_n_iters=2, seed=0)
    d_est, i_est = ivf_rabitq.search(idx, q, x.shape[0], n_probes=1,
                                     compute_dtype=jnp.float32)
    d_est, i_est = np.asarray(d_est), np.asarray(i_est)
    true = ((q[:, None, :] - x[i_est]) ** 2).sum(-1)
    rel = (d_est - true) / np.maximum(true, 1e-9)
    assert abs(rel.mean()) < 0.02, rel.mean()


def test_memory_footprint():
    x = make_blobs(RNG, 5000, 64)
    for bits in (1, 3, 8, 9):
        idx = ivf_rabitq.build(x, n_lists=16, bits_per_dim=bits, seed=0)
        assert idx.sorted_codes.dtype == np.uint32
        words = bitpack.packed_words(64, bits)
        assert idx.sorted_codes.shape[1] == words
        # packed bytes/vector at reference parity: ceil(d*bits/32)*4
        assert words * 4 <= (64 * bits + 31) // 32 * 4


def test_bad_bits():
    with pytest.raises(ValueError):
        ivf_rabitq.IndexParams(bits_per_dim=12)


def test_prefilter():
    x = make_blobs(RNG, 5000, 16)
    q = make_blobs(RNG, 16, 16)
    keep = RNG.random(5000) > 0.5
    idx = ivf_rabitq.build(x, n_lists=16, seed=0)
    d, i = ivf_rabitq.search(idx, q, 10, n_probes=16, prefilter=filters.from_mask(keep))
    i, d = np.asarray(i), np.asarray(d)
    assert keep[i[np.isfinite(d)]].all()
