import numpy as np
import pytest

from cuvs_tpu.neighbors import brute_force, filters, ivf_flat
from tests.utils import naive_knn, calc_recall, make_blobs

RNG = np.random.default_rng(7)


def _data(n=20000, dim=32, nq=100):
    x = make_blobs(RNG, n, dim, n_centers=100)
    q = make_blobs(RNG, nq, dim, n_centers=100)
    return x, q


@pytest.mark.parametrize("metric", ["sqeuclidean", "euclidean", "inner_product", "cosine"])
def test_recall(metric):
    x, q = _data()
    idx = ivf_flat.build(x, n_lists=64, metric=metric, seed=0)
    d, i = ivf_flat.search(idx, q, 10, n_probes=20)
    gtd, gti = naive_knn(q, x, 10, metric=metric)
    recall = calc_recall(np.asarray(i), gti, np.asarray(d), gtd)
    assert recall >= 0.93, (metric, recall)


def test_full_probes_is_exact():
    x, q = _data(5000, 16, 50)
    idx = ivf_flat.build(x, n_lists=32, seed=0)
    d, i = ivf_flat.search(idx, q, 10, n_probes=32)
    gtd, gti = naive_knn(q, x, 10)
    recall = calc_recall(np.asarray(i), gti, np.asarray(d), gtd)
    assert recall >= 0.9999, recall
    np.testing.assert_allclose(np.asarray(d), gtd, rtol=1e-3, atol=1e-3)


def test_probe_monotonicity():
    x, q = _data(10000, 16, 50)
    idx = ivf_flat.build(x, n_lists=64, seed=0)
    gtd, gti = naive_knn(q, x, 10)
    recalls = []
    for p in (1, 4, 16, 64):
        _, i = ivf_flat.search(idx, q, 10, n_probes=p)
        recalls.append(calc_recall(np.asarray(i), gti))
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] > 0.999


def test_metric_udf():
    """Search-time metric UDF (ivf_flat.hpp:80 metric_udf analog): an L1
    callable traced into coarse search + both unfused scans must match
    naive L1 ground truth over the probed lists."""
    import jax.numpy as jnp
    from tests.utils import naive_knn, calc_recall

    rng = np.random.default_rng(23)
    x = rng.standard_normal((4000, 24)).astype(np.float32)
    q = rng.standard_normal((48, 24)).astype(np.float32)
    idx = ivf_flat.build(x, n_lists=16, seed=0)

    def l1(a, b):
        return jnp.sum(jnp.abs(a[:, None, :] - b[None, :, :]), axis=2)

    d_l1 = np.abs(q[:, None, :] - x[None, :, :]).sum(2)
    gti = np.argsort(d_l1, axis=1)[:, :10]
    gtd = np.take_along_axis(d_l1, gti, axis=1)
    for algo in ("cluster_major", "query_major"):
        d, i = ivf_flat.search(idx, q, 10, n_probes=16, scan_algo=algo,
                               metric_udf=l1)
        rec = calc_recall(np.asarray(i), gti, np.asarray(d), gtd)
        assert rec >= 0.99, (algo, rec)
        np.testing.assert_allclose(
            np.sort(np.asarray(d), 1)[:, :3], np.sort(gtd, 1)[:, :3],
            rtol=1e-3, atol=1e-3)


def test_prefilter():
    x, q = _data(5000, 16, 20)
    keep = RNG.random(5000) > 0.5
    idx = ivf_flat.build(x, n_lists=32, seed=0)
    d, i = ivf_flat.search(idx, q, 10, n_probes=32, prefilter=filters.from_mask(keep))
    i = np.asarray(i)
    d = np.asarray(d)
    valid = np.isfinite(d)
    assert keep[i[valid]].all()
    kept = np.where(keep)[0]
    gtd, gtl = naive_knn(q, x[kept], 10)
    assert calc_recall(i, kept[gtl]) >= 0.99


def test_extend():
    x, q = _data(8000, 16, 30)
    idx = ivf_flat.build(x[:5000], n_lists=32, seed=0)
    idx = ivf_flat.extend(idx, x[5000:])
    assert idx.size == 8000
    d, i = ivf_flat.search(idx, q, 10, n_probes=32)
    gtd, gti = naive_knn(q, x, 10)
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.99


def test_extend_with_ids():
    x, _ = _data(2000, 8, 1)
    idx = ivf_flat.build(x[:1000], n_lists=16, seed=0)
    custom = np.arange(700000, 701000, dtype=np.int32)
    idx = ivf_flat.extend(idx, x[1000:], new_ids=custom)
    q = x[1500:1510]
    d, i = ivf_flat.search(idx, q, 1, n_probes=16)
    assert (np.asarray(i).ravel() == custom[500:510]).mean() >= 0.9


def test_adaptive_centers():
    x, _ = _data(4000, 8, 1)
    idx = ivf_flat.build(x[:2000], n_lists=16, adaptive_centers=True, seed=0)
    before = np.asarray(idx.centers).copy()
    idx2 = ivf_flat.extend(idx, x[2000:] + 5.0)
    after = np.asarray(idx2.centers)
    assert not np.allclose(before, after)
    # non-adaptive: frozen
    idx3 = ivf_flat.build(x[:2000], n_lists=16, adaptive_centers=False, seed=0)
    idx4 = ivf_flat.extend(idx3, x[2000:] + 5.0)
    np.testing.assert_allclose(np.asarray(idx3.centers), np.asarray(idx4.centers))


def test_ids_are_global_rows():
    x, q = _data(3000, 16, 10)
    idx = ivf_flat.build(x, n_lists=16, seed=0)
    d, i = ivf_flat.search(idx, x[:10], 1, n_probes=16)
    np.testing.assert_array_equal(np.asarray(i).ravel(), np.arange(10))


def test_int8_storage():
    """int8 list storage: MXU int8 scan with exact f32 norms."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    x = make_blobs(rng, 30000, 64, n_centers=64)
    q = make_blobs(rng, 512, 64, n_centers=64)
    gtd, gti = naive_knn(q, x, 10)
    idx = ivf_flat.build(x, n_lists=64, storage_dtype=jnp.int8)
    assert idx.sorted_data.dtype == jnp.int8 and idx.q_scale is not None
    for algo in ("cluster_major", "query_major"):
        _, i = ivf_flat.search(idx, q, 10, n_probes=16, scan_algo=algo)
        assert calc_recall(np.asarray(i), gti) >= 0.85, algo
    # extend quantizes with the existing scale
    idx2 = ivf_flat.extend(idx, x[:100])
    assert idx2.sorted_data.dtype == jnp.int8
    _, i = ivf_flat.search(idx2, q, 10, n_probes=16)
    assert calc_recall(np.asarray(i), gti) >= 0.8


def test_train_only_build_then_extend():
    """add_data_on_build=False (ivf_flat.hpp:28-66): train the coarse
    quantizer only, populate via extend()."""
    import jax.numpy as jnp

    x, q = _data(8000, 32, 50)
    gtd, gti = naive_knn(q, x, 10)
    for sd in (None, jnp.int8):
        idx = ivf_flat.build(x, n_lists=32, add_data_on_build=False,
                             storage_dtype=sd, seed=0)
        assert idx.n_rows == 0 and idx.size == 0
        idx = ivf_flat.extend(idx, x)
        assert idx.n_rows == 8000
        _, i = ivf_flat.search(idx, q, 10, n_probes=16)
        floor = 0.85 if sd is None else 0.75
        assert calc_recall(np.asarray(i), gti) >= floor, sd


def test_streaming_build_host_mode_lane_aligned():
    """HOST-mode build_streaming must lane-align storage (width % 128 == 0)
    exactly like device mode: the fused scan's window DMA requires it."""
    rng = np.random.default_rng(3)
    n, d = 12000, 96  # deep-96-like non-aligned width
    x = make_blobs(rng, n, d, n_centers=64)
    q = make_blobs(rng, 100, d, n_centers=64)
    n_slices = 4
    step = n // n_slices

    def provider(i):
        return x[i * step : (i + 1) * step]  # numpy => host mode

    idx = ivf_flat.build_streaming(
        provider, n_slices=n_slices, n_lists=64,
        trainset_rows=4000, seed=0,
    )
    assert idx.sorted_data.shape[1] % 128 == 0, idx.sorted_data.shape
    assert idx.sorted_data.dtype == np.int8
    gtd, gti = naive_knn(q, x, 10)
    _, i = ivf_flat.search(idx, q, 10, n_probes=24)
    assert calc_recall(np.asarray(i), gti) >= 0.8
