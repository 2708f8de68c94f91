import numpy as np
import pytest

from cuvs_tpu.neighbors import ivf_pq, refine, filters
from tests.utils import naive_knn, calc_recall, make_blobs

RNG = np.random.default_rng(9)


def _data(n=20000, dim=64, nq=100):
    x = make_blobs(RNG, n, dim, n_centers=100)
    q = make_blobs(RNG, nq, dim, n_centers=100)
    return x, q


def test_calculate_pq_dim():
    assert ivf_pq.calculate_pq_dim(128) == 64
    assert ivf_pq.calculate_pq_dim(96) == 96 // 32 * 32
    assert ivf_pq.calculate_pq_dim(960) == 480  # 960/2=480, already /32
    assert ivf_pq.calculate_pq_dim(20) == 16
    assert ivf_pq.calculate_pq_dim(7) == 4


def test_recall_l2():
    x, q = _data()
    idx = ivf_pq.build(x, n_lists=64, pq_dim=32, seed=0)
    d, i = ivf_pq.search(idx, q, 10, n_probes=32)
    gtd, gti = naive_knn(q, x, 10)
    # raw ADC ranking on tightly-clustered blobs scrambles near-ties; the
    # refine pipeline below is the real quality gate (cuvs tests do the same)
    recall = calc_recall(np.asarray(i), gti)
    assert recall >= 0.65, recall


def test_chunked_residuals_match_unchunked(monkeypatch):
    """build()'s transient-bounded residual pass (lax.map chunks, the
    1M x 960 HBM fix) must produce the same index as the one-shot path."""
    x, q = _data(n=4096, dim=64)
    monkeypatch.setattr(ivf_pq, "_RES_CHUNK_BYTES", 64 * 4 * 512)  # 512-row chunks
    idx_c = ivf_pq.build(x, n_lists=16, pq_dim=32, seed=0)
    monkeypatch.setattr(ivf_pq, "_RES_CHUNK_BYTES", 256 << 20)
    idx_u = ivf_pq.build(x, n_lists=16, pq_dim=32, seed=0)
    np.testing.assert_array_equal(np.asarray(idx_c.sorted_codes),
                                  np.asarray(idx_u.sorted_codes))


def test_recall_with_refine():
    x, q = _data()
    idx = ivf_pq.build(x, n_lists=64, pq_dim=32, seed=0)
    d, i = ivf_pq.search(idx, q, 40, n_probes=32)
    rd, ri = refine.refine(x, q, i, 10)
    gtd, gti = naive_knn(q, x, 10)
    recall = calc_recall(np.asarray(ri), gti)
    assert recall >= 0.95, recall
    # refine distances are exact
    sel = np.asarray(rd)
    full_d = np.take_along_axis(
        (q * q).sum(1)[:, None] + (x * x).sum(1)[None, :] - 2 * q @ x.T,
        np.asarray(ri),
        axis=1,
    )
    np.testing.assert_allclose(sel, np.maximum(full_d, 0), rtol=1e-3, atol=1e-2)


def test_per_cluster_codebooks():
    """codebook_gen=PER_CLUSTER (ivf_pq.hpp:34, train_per_cluster
    ivf_pq_build.cuh:410): one codebook per list. On blob data where each
    list covers one mode, per-cluster codebooks fit residuals at least as
    well as shared per-subspace ones."""
    x, q = _data(12000, 32, 60)
    gtd, gti = naive_knn(q, x, 10)
    recalls = {}
    for gen in ("per_subspace", "per_cluster"):
        idx = ivf_pq.build(x, n_lists=32, pq_dim=16, codebook_gen=gen, seed=0)
        assert idx.pq_dim == 16
        d, i = ivf_pq.search(idx, q, 40, n_probes=16)
        rd, ri = refine.refine(x, q, i, 10)
        recalls[gen] = calc_recall(np.asarray(ri), gti)
    assert recalls["per_cluster"] >= 0.9, recalls
    # both scan layouts agree for per-cluster codebooks
    idx = ivf_pq.build(x, n_lists=32, pq_dim=16, codebook_gen="per_cluster", seed=0)
    d1, i1 = ivf_pq.search(idx, q, 10, n_probes=16, scan_algo="query_major")
    d2, i2 = ivf_pq.search(idx, q, 10, n_probes=16, scan_algo="cluster_major")
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-3, atol=1e-3)


def test_per_cluster_extend_and_roundtrip(tmp_path):
    from cuvs_tpu.utils import serialize

    x, q = _data(6000, 32, 20)
    idx = ivf_pq.build(x[:5000], n_lists=16, pq_dim=16, codebook_gen="per_cluster", seed=0)
    idx = ivf_pq.extend(idx, x[5000:])
    assert idx.size == 6000
    p = str(tmp_path / "pc.npz")
    serialize.save(p, idx)
    idx2 = serialize.load(p)
    assert idx2.codebook_gen == "per_cluster" and idx2.pq_dim == 16
    d1, i1 = ivf_pq.search(idx, q, 5, n_probes=8)
    d2, i2 = ivf_pq.search(idx2, q, 5, n_probes=8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_lut_dtype_bf16_accuracy():
    """Exercised lut_dtype knob (ivf_pq.hpp:160 search_params.lut_dtype):
    a bf16 LUT must stay within a few recall points of f32."""
    import jax.numpy as jnp

    x, q = _data(10000, 32, 60)
    gtd, gti = naive_knn(q, x, 10)
    idx = ivf_pq.build(x, n_lists=32, pq_dim=16, seed=0)
    recalls = {}
    for dt in (jnp.float32, jnp.bfloat16):
        d, i = ivf_pq.search(idx, q, 10, n_probes=16, lut_dtype=dt,
                             scan_algo="query_major")
        recalls[dt] = calc_recall(np.asarray(i), gti)
    assert recalls[jnp.bfloat16] >= recalls[jnp.float32] - 0.05, recalls


def test_recall_inner_product():
    x, q = _data()
    idx = ivf_pq.build(x, n_lists=64, pq_dim=32, metric="inner_product", seed=0)
    d, i = ivf_pq.search(idx, q, 30, n_probes=48)
    gtd, gti = naive_knn(q, x, 10, metric="inner_product")
    rd, ri = refine.refine(x, q, i, 10, metric="inner_product")
    recall = calc_recall(np.asarray(ri), gti)
    assert recall >= 0.85, recall


def test_pq_bits_tradeoff():
    x, q = _data(10000, 32, 50)
    gtd, gti = naive_knn(q, x, 10)
    recalls = {}
    for bits in (4, 8):
        idx = ivf_pq.build(x, n_lists=32, pq_dim=16, pq_bits=bits, seed=0)
        _, i = ivf_pq.search(idx, q, 10, n_probes=32)
        recalls[bits] = calc_recall(np.asarray(i), gti)
    assert recalls[8] >= recalls[4] - 0.02
    assert recalls[8] >= 0.75


def test_rotation_dim_not_divisible():
    x, q = _data(5000, 30, 20)  # 30 not divisible by pq_dim=8
    idx = ivf_pq.build(x, n_lists=16, pq_dim=8, seed=0)
    assert idx.rot_dim == 32
    d, i = ivf_pq.search(idx, q, 40, n_probes=16)
    rd, ri = refine.refine(x, q, i, 5)
    gtd, gti = naive_knn(q, x, 5)
    assert calc_recall(np.asarray(ri), gti) >= 0.9


def test_extend():
    x, q = _data(8000, 32, 30)
    idx = ivf_pq.build(x[:5000], n_lists=32, pq_dim=16, seed=0)
    idx = ivf_pq.extend(idx, x[5000:])
    assert idx.size == 8000
    d, i = ivf_pq.search(idx, q, 40, n_probes=32)
    rd, ri = refine.refine(x, q, i, 10)
    gtd, gti = naive_knn(q, x, 10)
    assert calc_recall(np.asarray(ri), gti) >= 0.9


def test_prefilter():
    x, q = _data(5000, 32, 20)
    keep = RNG.random(5000) > 0.5
    idx = ivf_pq.build(x, n_lists=32, pq_dim=16, seed=0)
    d, i = ivf_pq.search(idx, q, 10, n_probes=32, prefilter=filters.from_mask(keep))
    i, d = np.asarray(i), np.asarray(d)
    assert keep[i[np.isfinite(d)]].all()


def test_refine_rejects_bad_k():
    x, q = _data(100, 8, 2)
    with pytest.raises(ValueError):
        refine.refine(x, q, np.zeros((2, 5), np.int32), 10)


def test_train_only_build_then_extend():
    """add_data_on_build=False (ivf_pq.hpp:47-132): codebooks trained,
    lists empty until extend()."""
    rng = np.random.default_rng(11)
    x = make_blobs(rng, 6000, 32, n_centers=64)
    q = make_blobs(rng, 50, 32, n_centers=64)
    gtd, gti = naive_knn(q, x, 10)
    idx = ivf_pq.build(x, n_lists=32, pq_dim=16, add_data_on_build=False,
                       seed=0)
    assert idx.n_rows == 0
    idx = ivf_pq.extend(idx, x)
    assert idx.n_rows == 6000
    _, i = ivf_pq.search(idx, q, 10, n_probes=32)
    assert calc_recall(np.asarray(i), gti) >= 0.7


def test_build_streaming_matches_in_memory():
    """build_streaming (bigann-1B regime: host slices, codes-only on
    device): recall parity with the in-memory builder and a byte-identical
    fused serving layout."""
    import jax.numpy as jnp

    from cuvs_tpu.core import bitpack
    from cuvs_tpu.neighbors import ivf_scan

    rng = np.random.default_rng(2)
    slices = [make_blobs(rng, 2500 if i < 5 else 1300, 96, n_centers=64)
              for i in range(6)]
    x = np.concatenate(slices)
    q = make_blobs(rng, 64, 96, n_centers=64)
    gtd, gti = naive_knn(q, x, 10)

    idx = ivf_pq.build_streaming(lambda i: slices[i], 6, n_lists=32,
                                 pq_dim=48, trainset_rows=4000)
    assert idx.n_rows == x.shape[0]
    _, i = ivf_pq.search(idx, q, 10, n_probes=32)
    r_stream = calc_recall(np.asarray(i), gti)

    idx2 = ivf_pq.build(x, n_lists=32, pq_dim=48, seed=0)
    _, i2 = ivf_pq.search(idx2, q, 10, n_probes=32)
    r_mem = calc_recall(np.asarray(i2), gti)
    assert r_stream >= r_mem - 0.05, (r_stream, r_mem)

    # the chunked serving layout must equal the one-shot helper's bytes
    cs = jnp.asarray(np.asarray(bitpack.unpack(
        idx.sorted_codes[: idx.n_rows], idx.pq_bits, idx.pq_dim_static
    )).astype(np.uint8))
    np.testing.assert_array_equal(
        np.asarray(idx.sorted_codes_t),
        np.asarray(ivf_scan.pack_codes_transposed(cs, idx.window)),
    )
