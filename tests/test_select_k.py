import numpy as np
import pytest

from cuvs_tpu.selection import select_k, merge_parts


RNG = np.random.default_rng(0)


@pytest.mark.parametrize("b,n,k", [(1, 10, 3), (7, 100, 10), (4, 5000, 64), (3, 100000, 128)])
@pytest.mark.parametrize("select_min", [True, False])
def test_select_k_exact(b, n, k, select_min):
    vals = RNG.standard_normal((b, n)).astype(np.float32)
    v, i = select_k(vals, k, select_min=select_min)
    v, i = np.asarray(v), np.asarray(i)
    order = np.sort(vals, axis=1)
    want = order[:, :k] if select_min else order[:, ::-1][:, :k]
    np.testing.assert_allclose(v, want, rtol=1e-6)
    # indices point at the right values
    np.testing.assert_allclose(np.take_along_axis(vals, i, axis=1), v, rtol=1e-6)


def test_select_k_sorted_output():
    vals = RNG.standard_normal((5, 333)).astype(np.float32)
    v, _ = select_k(vals, 17)
    v = np.asarray(v)
    assert (np.diff(v, axis=1) >= 0).all()


def test_select_k_payload_indices():
    vals = RNG.standard_normal((2, 50)).astype(np.float32)
    payload = RNG.integers(1000, 2000, (2, 50)).astype(np.int32)
    v, i = select_k(vals, 5, indices=payload)
    i = np.asarray(i)
    assert ((i >= 1000) & (i < 2000)).all()


def test_select_k_len_i():
    vals = np.tile(np.arange(20, dtype=np.float32)[::-1], (3, 1))  # 19..0
    len_i = np.array([5, 10, 20])
    v, i = select_k(vals, 4, len_i=len_i)
    v = np.asarray(v)
    # row 0: only first 5 entries (19..15) valid -> smallest 4 = 16,17,18,19
    np.testing.assert_allclose(v[0], [15, 16, 17, 18])
    np.testing.assert_allclose(v[1], [10, 11, 12, 13])
    np.testing.assert_allclose(v[2], [0, 1, 2, 3])


def test_select_k_k_larger_than_n():
    vals = RNG.standard_normal((2, 3)).astype(np.float32)
    v, i = select_k(vals, 8)
    v = np.asarray(v)
    assert np.isinf(v[:, 3:]).all()
    np.testing.assert_allclose(np.sort(vals, 1), v[:, :3], rtol=1e-6)


def test_merge_parts():
    k = 8
    parts_v, parts_i = [], []
    all_v = []
    for p in range(4):
        v = np.sort(RNG.standard_normal((3, k)).astype(np.float32), axis=1)
        ids = np.arange(p * 100, p * 100 + k, dtype=np.int32)[None].repeat(3, 0)
        parts_v.append(v)
        parts_i.append(ids)
        all_v.append(v)
    mv, mi = merge_parts(parts_v, parts_i, k)
    want = np.sort(np.concatenate(all_v, axis=1), axis=1)[:, :k]
    np.testing.assert_allclose(np.asarray(mv), want, rtol=1e-6)
