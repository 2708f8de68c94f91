import numpy as np

from cuvs_tpu.core import (
    bitset_create,
    bitset_from_mask,
    bitset_set,
    bitset_test,
    bitset_to_mask,
    bitmap_from_mask,
    bitmap_test,
)


def test_roundtrip():
    rng = np.random.default_rng(1)
    mask = rng.random(197) > 0.5
    bs = bitset_from_mask(mask)
    assert bs.shape == (7,)
    np.testing.assert_array_equal(np.asarray(bitset_to_mask(bs, 197)), mask)


def test_create_and_set():
    bs = bitset_create(100, default=True)
    assert np.asarray(bitset_to_mask(bs, 100)).all()
    bs = bitset_set(bs, [3, 50, 99], value=False)
    m = np.asarray(bitset_to_mask(bs, 100))
    assert not m[3] and not m[50] and not m[99]
    assert m.sum() == 97


def test_test_ids():
    mask = np.zeros(64, bool)
    mask[[0, 31, 32, 63]] = True
    bs = bitset_from_mask(mask)
    got = np.asarray(bitset_test(bs, np.array([0, 1, 31, 32, 62, 63])))
    np.testing.assert_array_equal(got, [True, False, True, True, False, True])


def test_bitmap():
    rng = np.random.default_rng(2)
    mask = rng.random((4, 70)) > 0.3
    bm = bitmap_from_mask(mask)
    assert bm.shape == (4, 3)
    q = np.array([0, 1, 2, 3])[:, None]
    ids = np.arange(70)[None, :].repeat(4, 0)
    got = np.asarray(bitmap_test(bm, q, ids))
    np.testing.assert_array_equal(got, mask)
