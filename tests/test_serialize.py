import numpy as np
import pytest

from cuvs_tpu.neighbors import brute_force, cagra, ivf_flat, ivf_pq
from cuvs_tpu.utils import serialize
from tests.utils import make_blobs

RNG = np.random.default_rng(31)


def _roundtrip(tmp_path, index, search_fn, q):
    path = str(tmp_path / "index.npz")
    serialize.save(path, index)
    loaded = serialize.load(path)
    d1, i1 = search_fn(index, q)
    d2, i2 = search_fn(loaded, q)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)


def test_brute_force_roundtrip(tmp_path):
    x = make_blobs(RNG, 500, 16)
    q = make_blobs(RNG, 5, 16)
    idx = brute_force.build(x, metric="euclidean")
    _roundtrip(tmp_path, idx, lambda ix, qq: brute_force.search(ix, qq, 5), q)


def test_ivf_flat_roundtrip(tmp_path):
    x = make_blobs(RNG, 2000, 16)
    q = make_blobs(RNG, 5, 16)
    idx = ivf_flat.build(x, n_lists=16, seed=0)
    _roundtrip(tmp_path, idx, lambda ix, qq: ivf_flat.search(ix, qq, 5, n_probes=8), q)


def test_ivf_pq_roundtrip(tmp_path):
    x = make_blobs(RNG, 2000, 32)
    q = make_blobs(RNG, 5, 32)
    idx = ivf_pq.build(x, n_lists=16, pq_dim=8, seed=0)
    _roundtrip(tmp_path, idx, lambda ix, qq: ivf_pq.search(ix, qq, 5, n_probes=8), q)


def test_cagra_roundtrip(tmp_path):
    x = RNG.standard_normal((2000, 16)).astype(np.float32)
    q = RNG.standard_normal((5, 16)).astype(np.float32)
    idx = cagra.build(x, intermediate_graph_degree=32, graph_degree=16, seed=0)
    _roundtrip(tmp_path, idx, lambda ix, qq: cagra.search(ix, qq, 5, seed=3), q)


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "bad.npz"
    np.savez(p, __header__=np.frombuffer(b'{"magic": "evil"}', np.uint8))
    with pytest.raises(ValueError, match="magic"):
        serialize.load(str(p))


def test_kind_mismatch_rejected(tmp_path):
    x = make_blobs(RNG, 100, 8)
    idx = brute_force.build(x)
    p = str(tmp_path / "i.npz")
    serialize.save(p, idx)
    with pytest.raises(ValueError, match="expected"):
        serialize.load(p, expected_kind="cagra")


def test_newer_version_rejected(tmp_path):
    import json

    hdr = {"magic": serialize.MAGIC, "version": 999, "kind": "brute_force",
           "statics": {}, "arrays": []}
    p = tmp_path / "v.npz"
    np.savez(p, __header__=np.frombuffer(json.dumps(hdr).encode(), np.uint8))
    with pytest.raises(ValueError, match="version"):
        serialize.load(str(p))
