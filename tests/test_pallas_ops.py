"""Pallas fused kernels — interpret-mode tests (exact on CPU)."""

import numpy as np
import pytest

from cuvs_tpu.ops import bf_topk_pallas
from tests.utils import naive_knn, calc_recall, make_blobs

RNG = np.random.default_rng(151)


def test_fused_bf_topk_exact_l2():
    x = make_blobs(RNG, 3000, 32)
    q = make_blobs(RNG, 64, 32)
    d, i = bf_topk_pallas.search(x, None, q, 10, compute_dtype=np.float32, interpret=True)
    gtd, gti = naive_knn(q, x, 10)
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.999
    np.testing.assert_allclose(np.asarray(d), gtd, rtol=1e-3, atol=1e-3)


def test_fused_bf_topk_ip():
    from cuvs_tpu.distance.pairwise import DistanceType

    x = make_blobs(RNG, 2000, 16)
    q = make_blobs(RNG, 32, 16)
    d, i = bf_topk_pallas.search(
        x, None, q, 5, metric=DistanceType.InnerProduct,
        compute_dtype=np.float32, interpret=True,
    )
    gtd, gti = naive_knn(q, x, 5, metric="inner_product")
    assert calc_recall(np.asarray(i), gti) >= 0.999


def test_fused_handles_padding():
    # n and B not multiples of the tiles
    x = make_blobs(RNG, 1537, 8)
    q = make_blobs(RNG, 35, 8)
    d, i = bf_topk_pallas.search(
        x, None, q, 7, compute_dtype=np.float32, tile_n=512, block_q=16, interpret=True
    )
    gtd, gti = naive_knn(q, x, 7)
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.999
    assert (np.asarray(i) < 1537).all()


def test_fused_rejects_bad_metric():
    from cuvs_tpu.distance.pairwise import DistanceType

    with pytest.raises(ValueError):
        bf_topk_pallas.search(
            np.zeros((10, 4), np.float32), None, np.zeros((2, 4), np.float32),
            2, metric=DistanceType.Canberra, interpret=True,
        )


def test_fused_int8_approx_mode():
    # int8 approx path: int32 in-kernel epilogue (pen = rounded half-norm,
    # pool-only f32 convert) must rank like the f32 reference within the
    # int8 quantization noise
    x = make_blobs(RNG, 20000, 16)
    q = make_blobs(RNG, 32, 16)
    scale = float(np.abs(x).max() / 127.0)
    x8 = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
    d, i = bf_topk_pallas.search(
        x8, None, q, 10, q_scale=scale, exact=False, interpret=True
    )
    gtd, gti = naive_knn(q, x, 10)
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.9
    # returned distances are rescaled quantized-space L2: close to true
    d0 = np.sort(np.asarray(d), axis=1)[:, 0]
    g0 = np.sort(gtd, axis=1)[:, 0]
    np.testing.assert_allclose(d0, g0, rtol=0.15, atol=0.5)


def test_fused_block_max_mode():
    # bin-collision loss scales as k^2 / (2 * n/128): needs n >> 128*k^2
    x = make_blobs(RNG, 20000, 16)
    q = make_blobs(RNG, 32, 16)
    d, i = bf_topk_pallas.search(
        x, None, q, 10, compute_dtype=np.float32, exact=False, interpret=True
    )
    gtd, gti = naive_knn(q, x, 10)
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.93
