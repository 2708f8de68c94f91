"""Dataset dtype coverage: float32 / float16 / int8 / uint8 storage.

Reference instantiates every index for float/half/int8/uint8
(/root/reference/cpp/src/neighbors/cagra_build_matrix.json,
ivf_flat.hpp:26 veclen machinery). Here the dataset is STORED as-is and
cast to the compute dtype inside the MXU matmuls.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cuvs_tpu.neighbors import brute_force, cagra, ivf_flat
from tests.utils import naive_knn, calc_recall

RNG = np.random.default_rng(77)

DTYPES = [np.float32, np.float16, np.int8, np.uint8]


def _data(dtype, n=6000, dim=32, nq=40):
    x = RNG.standard_normal((n, dim)) * 2.0
    q = RNG.standard_normal((nq, dim)) * 2.0
    if np.dtype(dtype) == np.int8:
        x = np.clip(np.round(x * 20), -127, 127)
        q = np.clip(np.round(q * 20), -127, 127)
    elif np.dtype(dtype) == np.uint8:
        x = np.clip(np.round(x * 20 + 128), 0, 255)
        q = np.clip(np.round(q * 20 + 128), 0, 255)
    return x.astype(dtype), q.astype(dtype)


@pytest.mark.parametrize("dtype", DTYPES)
def test_brute_force_dtype(dtype):
    x, q = _data(dtype)
    idx = brute_force.build(x)
    assert idx.dataset.dtype == jnp.dtype(dtype)
    d, i = brute_force.search(idx, q, 10)
    gtd, gti = naive_knn(q.astype(np.float32), x.astype(np.float32), 10)
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.99, dtype


@pytest.mark.parametrize("dtype", DTYPES)
def test_ivf_flat_dtype(dtype):
    x, q = _data(dtype)
    idx = ivf_flat.build(x, n_lists=16, seed=0)
    assert idx.sorted_data.dtype == jnp.dtype(dtype)
    d, i = ivf_flat.search(idx, q, 10, n_probes=16)  # all probes = exact
    gtd, gti = naive_knn(q.astype(np.float32), x.astype(np.float32), 10)
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.99, dtype


@pytest.mark.parametrize("dtype", DTYPES)
def test_cagra_dtype(dtype):
    x, q = _data(dtype)
    idx = cagra.build(
        x, intermediate_graph_degree=48, graph_degree=24, seed=0
    )
    assert idx.dataset.dtype == jnp.dtype(dtype)
    d, i = cagra.search(idx, q, 10, itopk_size=64)
    gtd, gti = naive_knn(q.astype(np.float32), x.astype(np.float32), 10)
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.85, dtype


def test_inner_product_int8():
    x, q = _data(np.int8)
    idx = brute_force.build(x, metric="inner_product")
    d, i = brute_force.search(idx, q, 10)
    gtd, gti = naive_knn(
        q.astype(np.float32), x.astype(np.float32), 10, metric="inner_product"
    )
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.99
