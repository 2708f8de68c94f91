import numpy as np
import pytest

from cuvs_tpu.neighbors import (
    brute_force, cagra, ivf_flat, ivf_pq, ivf_rabitq, ivf_sq,
)
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


def test_ivf_sq_roundtrip(tmp_path):
    x = make_blobs(RNG, 2000, 16)
    q = make_blobs(RNG, 5, 16)
    idx = ivf_sq.build(x, n_lists=16, seed=0)
    _roundtrip(tmp_path, idx, lambda ix, qq: ivf_sq.search(ix, qq, 5, n_probes=8), q)


def test_ivf_rabitq_roundtrip(tmp_path):
    x = make_blobs(RNG, 2000, 32)
    q = make_blobs(RNG, 5, 32)
    idx = ivf_rabitq.build(x, n_lists=16, bits_per_dim=4, seed=0)
    _roundtrip(
        tmp_path, idx, lambda ix, qq: ivf_rabitq.search(ix, qq, 5, n_probes=8), q
    )


def test_cagra_compressed_roundtrip(tmp_path):
    x = RNG.standard_normal((1500, 16)).astype(np.float32)
    q = RNG.standard_normal((4, 16)).astype(np.float32)
    idx = cagra.compress(
        cagra.build(x, intermediate_graph_degree=32, graph_degree=16, seed=0),
        vq_n_centers=16, pq_dim=8,
    )
    _roundtrip(tmp_path, idx, lambda ix, qq: cagra.search(ix, qq, 5, seed=3), q)


def test_tiered_roundtrip(tmp_path):
    from cuvs_tpu.neighbors import tiered_index

    x = make_blobs(RNG, 1200, 16)
    extra = make_blobs(RNG, 60, 16)
    q = make_blobs(RNG, 5, 16)
    t = tiered_index.build(
        ivf_flat, x, ann_params=ivf_flat.IndexParams(n_lists=8, seed=0),
        min_ann_rows=1000,
    )
    t = tiered_index.extend(t, extra)  # leaves a hot BF tier
    assert t.ann_index is not None and t.bf_data is not None
    path = str(tmp_path / "tiered")
    tiered_index.save(path, t)
    t2 = tiered_index.load(path)
    d1, i1 = tiered_index.search(t, q, 5, ann_kw=dict(n_probes=8))
    d2, i2 = tiered_index.search(t2, q, 5, ann_kw=dict(n_probes=8))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    assert t2.min_ann_rows == t.min_ann_rows and t2.ann_rows == t.ann_rows


def test_scann_roundtrip(tmp_path):
    from cuvs_tpu.neighbors import scann

    x = make_blobs(RNG, 600, 16)
    idx = scann.build(x, n_lists=8, pq_dim=8, partitioning_eta=2.0, seed=0)
    d = str(tmp_path / "scann_assets")
    scann.serialize(idx, d)
    idx2 = scann.deserialize(d)
    np.testing.assert_array_equal(idx.labels, idx2.labels)
    np.testing.assert_array_equal(idx.soar_labels, idx2.soar_labels)
    np.testing.assert_array_equal(idx.codes, idx2.codes)
    np.testing.assert_allclose(idx.centers, idx2.centers)
    assert idx2.params.partitioning_eta == idx.params.partitioning_eta


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


def test_int8_and_packed_roundtrip(tmp_path):
    """New kinds: int8 brute_force / ivf_flat (q_scale) + packed CAGRA."""
    import jax.numpy as jnp

    from cuvs_tpu.neighbors import brute_force, cagra, ivf_flat

    rng = np.random.default_rng(1)
    x = make_blobs(rng, 5000, 32)
    q = make_blobs(rng, 32, 32)
    for idx in (
        brute_force.build(x, storage_dtype=jnp.int8),
        ivf_flat.build(x, n_lists=16, storage_dtype=jnp.int8),
        cagra.pack(cagra.build(x, intermediate_graph_degree=32, graph_degree=16)),
    ):
        kind = serialize.kind_of(idx)
        p = str(tmp_path / kind)
        serialize.save(p, idx)
        back = serialize.load(p)
        assert type(back) is type(idx)
        mod = {"brute_force": brute_force, "ivf_flat": ivf_flat,
               "cagra.PackedIndex": cagra}[kind]
        d0, i0 = mod.search(idx, q, 5)
        d1, i1 = mod.search(back, q, 5)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
