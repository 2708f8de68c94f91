"""API robustness edge cases across index families."""

import numpy as np
import pytest

from tests.utils import make_blobs

RNG = np.random.default_rng(171)


def test_k_equals_one_everywhere():
    from cuvs_tpu.neighbors import brute_force, cagra, ivf_flat, ivf_sq

    x = make_blobs(RNG, 500, 8)
    q = x[:5]
    b = brute_force.build(x)
    d, i = brute_force.search(b, q, 1)
    assert np.asarray(i).shape == (5, 1)
    assert (np.asarray(i)[:, 0] == np.arange(5)).all()

    f = ivf_flat.build(x, n_lists=8, seed=0)
    d, i = ivf_flat.search(f, q, 1, n_probes=8)
    assert (np.asarray(i)[:, 0] == np.arange(5)).mean() >= 0.8

    s = ivf_sq.build(x, n_lists=8, seed=0)
    d, i = ivf_sq.search(s, q, 1, n_probes=8)
    assert np.asarray(i).shape == (5, 1)

    c = cagra.build(x, intermediate_graph_degree=16, graph_degree=8, seed=0)
    d, i = cagra.search(c, q, 1, itopk_size=16)
    assert np.asarray(i).shape == (5, 1)


def test_single_query():
    from cuvs_tpu.neighbors import brute_force, cagra

    x = make_blobs(RNG, 300, 8)
    b = brute_force.build(x)
    d, i = brute_force.search(b, x[7][None], 3)
    assert np.asarray(i)[0, 0] == 7
    c = cagra.build(x, intermediate_graph_degree=16, graph_degree=8, seed=0)
    d, i = cagra.search(c, x[7][None], 3, itopk_size=16)
    assert np.asarray(i).shape == (1, 3)


def test_tiny_dataset():
    from cuvs_tpu.neighbors import brute_force, ivf_flat

    x = make_blobs(RNG, 12, 4)
    b = brute_force.build(x)
    d, i = brute_force.search(b, x[:3], 12)
    assert np.asarray(i).shape == (3, 12)
    f = ivf_flat.build(x, n_lists=64, seed=0)  # n_lists clamped to n
    assert f.n_lists <= 12
    d, i = ivf_flat.search(f, x[:2], 3, n_probes=64)
    assert np.isfinite(np.asarray(d)[:, 0]).all()


def test_duplicate_rows():
    from cuvs_tpu.neighbors import brute_force

    x = np.ones((50, 8), np.float32)
    b = brute_force.build(x)
    d, i = brute_force.search(b, x[:2], 5)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-4)


def test_kmeans_k_equals_n():
    from cuvs_tpu.cluster import kmeans

    x = make_blobs(RNG, 16, 4)
    centers, labels, inertia, _ = kmeans.fit(x, n_clusters=16, seed=0)
    assert float(inertia) < 1e-3  # every point its own cluster


def test_select_k_all_invalid_rows():
    from cuvs_tpu.selection import select_k

    vals = np.full((3, 10), np.inf, np.float32)
    v, i = select_k(vals, 4)
    assert np.isinf(np.asarray(v)).all()


def test_refine_with_all_invalid_candidates():
    from cuvs_tpu.neighbors import refine

    x = make_blobs(RNG, 100, 8)
    q = x[:2]
    cand = np.full((2, 6), -1, np.int32)
    d, i = refine.refine(x, q, cand, 3)
    assert np.isinf(np.asarray(d)).all()
