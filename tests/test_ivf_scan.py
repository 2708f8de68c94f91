"""Cluster-major scan equivalence vs the query-major reference path."""

import numpy as np
import pytest

from cuvs_tpu.neighbors import filters, ivf_flat
from tests.utils import naive_knn, calc_recall, make_blobs

RNG = np.random.default_rng(113)


def _setup(n=20000, dim=32, nq=256, n_lists=64):
    x = make_blobs(RNG, n, dim, n_centers=100)
    q = make_blobs(RNG, nq, dim, n_centers=100)
    idx = ivf_flat.build(x, n_lists=n_lists, seed=0)
    return x, q, idx


@pytest.mark.parametrize("metric", ["sqeuclidean", "inner_product", "cosine"])
def test_matches_query_major(metric):
    x = make_blobs(RNG, 10000, 16)
    q = make_blobs(RNG, 128, 16)
    idx = ivf_flat.build(x, n_lists=32, metric=metric, seed=0)
    d1, i1 = ivf_flat.search(idx, q, 10, n_probes=8, scan_algo="query_major")
    d2, i2 = ivf_flat.search(idx, q, 10, n_probes=8, scan_algo="cluster_major")
    # same probes, exact selection, generous M => identical results
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4, atol=1e-4)
    match = (np.asarray(i1) == np.asarray(i2)).mean()
    assert match > 0.999, match


def test_recall_cluster_major():
    x, q, idx = _setup()
    d, i = ivf_flat.search(idx, q, 10, n_probes=20, scan_algo="cluster_major")
    gtd, gti = naive_knn(q, x, 10)
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.9


def test_prefilter_cluster_major():
    x, q, idx = _setup(5000, 16, 64, 16)
    keep = RNG.random(5000) > 0.5
    d, i = ivf_flat.search(
        idx, q, 10, n_probes=16, scan_algo="cluster_major",
        prefilter=filters.from_mask(keep),
    )
    i, d = np.asarray(i), np.asarray(d)
    assert keep[i[np.isfinite(d)]].all()


def test_auto_picks_cluster_major_for_big_batches():
    # not observable directly; just exercise both regimes through auto
    x, q, idx = _setup(5000, 16, 512, 16)
    d, i = ivf_flat.search(idx, q, 5, n_probes=8)  # big batch -> cluster major
    d2, i2 = ivf_flat.search(idx, q[:2], 5, n_probes=2)  # tiny -> query major
    assert np.isfinite(np.asarray(d)).all()


def test_overflow_drop_is_bounded():
    # adversarial: every query probes the same cluster list order (identical
    # queries) => heavy overflow; recall of top-1 must survive because the
    # nearest cluster still serves the first M pairs and all queries are equal
    x = make_blobs(RNG, 2000, 8)
    idx = ivf_flat.build(x, n_lists=8, seed=0)
    q = np.tile(x[42][None], (256, 1))
    d, i = ivf_flat.search(idx, q, 1, n_probes=4, scan_algo="cluster_major")
    assert (np.asarray(i)[:, 0] == 42).mean() >= 0.9


def test_pq_cluster_major_matches_query_major():
    from cuvs_tpu.neighbors import ivf_pq

    x = make_blobs(RNG, 10000, 32)
    q = make_blobs(RNG, 128, 32)
    idx = ivf_pq.build(x, n_lists=32, pq_dim=16, seed=0)
    d1, i1 = ivf_pq.search(idx, q, 10, n_probes=8, scan_algo="query_major")
    d2, i2 = ivf_pq.search(idx, q, 10, n_probes=8, scan_algo="cluster_major")
    # decode-and-dot is mathematically identical to the ADC LUT
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-3, atol=1e-3)
    match = (np.asarray(i1) == np.asarray(i2)).mean()
    assert match > 0.99, match


def test_pq_cluster_major_ip():
    from cuvs_tpu.neighbors import ivf_pq

    x = make_blobs(RNG, 8000, 32)
    q = make_blobs(RNG, 128, 32)
    idx = ivf_pq.build(x, n_lists=32, pq_dim=16, metric="inner_product", seed=0)
    d1, i1 = ivf_pq.search(idx, q, 10, n_probes=8, scan_algo="query_major")
    d2, i2 = ivf_pq.search(idx, q, 10, n_probes=8, scan_algo="cluster_major")
    match = (np.asarray(i1) == np.asarray(i2)).mean()
    assert match > 0.95, match


def test_grouping_order_matches_argsort():
    """Counting-sort grouping (used above 4M rows) == stable argsort."""
    import jax.numpy as jnp

    from cuvs_tpu.neighbors.ivf_common import _grouping_order

    rng = np.random.default_rng(0)
    for n, n_lists in ((100_000, 257), (4097, 5), (50_000, 1)):
        labels = jnp.asarray(rng.integers(0, n_lists, n).astype(np.int32))
        got = np.asarray(_grouping_order(labels, n_lists, 1 << 12))
        exp = np.argsort(np.asarray(labels), kind="stable")
        assert np.array_equal(got, exp), (n, n_lists)


class TestFusedScan:
    """Fused Pallas scan (interpret mode on CPU) vs naive ground truth."""

    def _run(self, metric, storage_dtype=None, n=6000, d=48, nq=96, k=10):
        import jax.numpy as jnp
        from cuvs_tpu.neighbors import ivf_flat
        from tests.utils import naive_knn, calc_recall

        rng = np.random.default_rng(7)
        x = make_blobs(rng, n, d)
        q = make_blobs(rng, nq, d)
        idx = ivf_flat.build(x, n_lists=32, seed=0, metric=metric,
                             storage_dtype=storage_dtype)
        sp = ivf_flat.SearchParams(n_probes=32, scan_algo="fused")
        dv, di = ivf_flat.search(idx, q, k, sp)
        gtd, gti = naive_knn(q, x, k, metric=metric)
        return calc_recall(np.asarray(di), gti, np.asarray(dv), gtd), dv, gtd

    def test_l2_matches_exact(self):
        rec, dv, gtd = self._run("sqeuclidean")
        assert rec >= 0.99, rec
        np.testing.assert_allclose(
            np.sort(np.asarray(dv), axis=1)[:, :5],
            np.sort(gtd, axis=1)[:, :5], rtol=1e-3, atol=1e-2,
        )

    def test_inner_product(self):
        rec, _, _ = self._run("inner_product")
        assert rec >= 0.99, rec

    def test_int8_storage(self):
        rec, _, _ = self._run("sqeuclidean", storage_dtype=np.int8)
        assert rec >= 0.9, rec

    def _run_filtered(self, metric, kind, storage_dtype=None, n=6000, d=48,
                      nq=64, k=10, keep_frac=0.7):
        """Prefiltered search THROUGH the fused path vs naive filtered GT."""
        import jax.numpy as jnp
        from cuvs_tpu.neighbors import filters, ivf_flat
        from tests.utils import naive_knn, calc_recall

        rng = np.random.default_rng(11)
        x = make_blobs(rng, n, d)
        q = make_blobs(rng, nq, d)
        idx = ivf_flat.build(x, n_lists=32, seed=0, metric=metric,
                             storage_dtype=storage_dtype)
        if kind == "bitset":
            keep = rng.random(n) < keep_frac
            flt = filters.from_mask(jnp.asarray(keep))
            keep2 = np.broadcast_to(keep, (nq, n))
        elif kind == "bitmap":
            keep2 = rng.random((nq, n)) < keep_frac
            flt = filters.from_mask(jnp.asarray(keep2))
        else:  # udf: drop every 3rd row
            flt = filters.udf_filter(lambda qid, sid: sid % 3 != 0)
            keep2 = np.broadcast_to(np.arange(n) % 3 != 0, (nq, n))
        sp = ivf_flat.SearchParams(n_probes=32, scan_algo="fused")
        dv, di = ivf_flat.search(idx, q, k, sp, prefilter=flt)
        di, dv = np.asarray(di), np.asarray(dv)
        # per-query filtered ground truth
        recs = []
        for qi in range(nq):
            ids = np.nonzero(keep2[qi])[0]
            gtd, gtl = naive_knn(q[qi : qi + 1], x[ids], k, metric=metric)
            recs.append(calc_recall(di[qi : qi + 1], ids[gtl],
                                    dv[qi : qi + 1], gtd))
            assert keep2[qi][di[qi]].all() or not np.isfinite(dv[qi]).all()
        return float(np.mean(recs))

    def test_bitset_filter_l2(self):
        # exact semantics: the filter rides the kernel's penalty array
        assert self._run_filtered("sqeuclidean", "bitset") >= 0.99

    def test_bitset_filter_ip(self):
        assert self._run_filtered("inner_product", "bitset") >= 0.99

    def test_bitset_filter_int8(self):
        assert self._run_filtered("sqeuclidean", "bitset",
                                  storage_dtype=np.int8) >= 0.9

    def test_bitset_filter_dense(self):
        # heavy filtering (keep 10%): penalty-fold semantics stay exact
        assert self._run_filtered("sqeuclidean", "bitset",
                                  keep_frac=0.1) >= 0.95

    def test_bitmap_filter(self):
        # per-query masks ride the post-scan overfetch pass
        assert self._run_filtered("sqeuclidean", "bitmap") >= 0.95

    def test_udf_filter(self):
        assert self._run_filtered("sqeuclidean", "udf") >= 0.95

    def test_matches_unfused_tiled(self):
        import jax.numpy as jnp
        from cuvs_tpu.neighbors import ivf_flat

        rng = np.random.default_rng(3)
        x = make_blobs(rng, 4000, 40)
        q = make_blobs(rng, 64, 40)
        idx = ivf_flat.build(x, n_lists=16, seed=0)
        df, i_f = ivf_flat.search(
            idx, q, 10, ivf_flat.SearchParams(n_probes=16, scan_algo="fused"))
        dc, i_c = ivf_flat.search(
            idx, q, 10, ivf_flat.SearchParams(n_probes=16, scan_algo="cluster_major"))
        # same probes, exact bins vs exact sort: ids must agree (ties aside)
        agree = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(np.asarray(i_f), np.asarray(i_c))
        ])
        assert agree >= 0.98, agree
        np.testing.assert_allclose(np.asarray(df), np.asarray(dc),
                                   rtol=1e-3, atol=1e-2)


def test_tile_bound_sufficient_adversarial(capfd):
    """All queries probing ONE cluster (the adversarial distribution from
    the r1/r2 reviews): the default bound must not drop pairs, and a
    deliberately small bound must report loudly instead of silently."""
    from cuvs_tpu.neighbors import ivf_scan
    import jax.numpy as jnp

    nq, p, n_lists, M = 64, 4, 16, 8
    probe_ids = np.zeros((nq, p), np.int32)  # every pair -> cluster 0
    n_tiles = nq * p // M + min(n_lists, nq * p) + 1
    tc, qidx, pt, ps = ivf_scan.group_pairs_tiled(
        jnp.asarray(probe_ids), n_lists, M, int(n_tiles))
    assert int((np.asarray(pt) >= n_tiles).sum()) == 0

    # deliberately undersized bound: pairs are dropped AND reported
    small = 2
    tc, qidx, pt, ps = ivf_scan.group_pairs_tiled(
        jnp.asarray(probe_ids), n_lists, M, small)
    np.asarray(pt)  # force execution so debug print fires
    assert int((np.asarray(pt) >= small).sum()) > 0
    err = capfd.readouterr()
    assert "dropped" in (err.out + err.err)


class TestFusedPQScan:
    """Fused Pallas PQ scan (interpret mode on CPU): in-VMEM one-hot
    decode + bin select vs the unfused decode-and-dot scan and vs naive
    ground truth (reference analog: ivf_pq_compute_similarity_impl.cuh)."""

    def _build(self, metric="sqeuclidean", n=6000, d=48, nq=96):
        from cuvs_tpu.neighbors import ivf_pq

        rng = np.random.default_rng(11)
        x = make_blobs(rng, n, d)
        q = make_blobs(rng, nq, d)
        idx = ivf_pq.build(x, n_lists=32, pq_dim=d // 2, seed=0,
                           metric=metric)
        assert idx.sorted_codes_t is not None
        return idx, x, q

    def _agree(self, a, b, k):
        return np.mean([
            len(set(r1.tolist()) & set(r2.tolist())) / k
            for r1, r2 in zip(np.asarray(a), np.asarray(b))
        ])

    def test_matches_unfused_l2(self):
        from cuvs_tpu.neighbors import ivf_pq

        idx, x, q = self._build()
        df, i_f = ivf_pq.search(
            idx, q, 10, ivf_pq.SearchParams(n_probes=32, scan_algo="fused"))
        dc, i_c = ivf_pq.search(
            idx, q, 10,
            ivf_pq.SearchParams(n_probes=32, scan_algo="cluster_major"))
        # same ADC math, bf16 fused vs f32 unfused: near-tie flips only
        assert self._agree(i_f, i_c, 10) >= 0.9
        # ADC distances must track the unfused scan's values
        np.testing.assert_allclose(
            np.sort(np.asarray(df), axis=1)[:, :5],
            np.sort(np.asarray(dc), axis=1)[:, :5], rtol=0.05, atol=0.5,
        )

    def test_inner_product(self):
        from cuvs_tpu.neighbors import ivf_pq

        idx, x, q = self._build(metric="inner_product")
        df, i_f = ivf_pq.search(
            idx, q, 10, ivf_pq.SearchParams(n_probes=32, scan_algo="fused"))
        dc, i_c = ivf_pq.search(
            idx, q, 10,
            ivf_pq.SearchParams(n_probes=32, scan_algo="cluster_major"))
        assert self._agree(i_f, i_c, 10) >= 0.9

    @pytest.mark.parametrize("metric", ["sqeuclidean", "inner_product"])
    def test_int8_lut(self, metric):
        """lut_dtype=int8 quantizes the kernel's per-tile ADC LUT (the
        reference's lut_dtype=CUDA_R_8U knob): rankings must track the
        f32 unfused scan within the 8-bit rounding budget."""
        import jax.numpy as jnp
        from cuvs_tpu.neighbors import ivf_pq

        idx, x, q = self._build(metric=metric)
        df, i_f = ivf_pq.search(
            idx, q, 10,
            ivf_pq.SearchParams(n_probes=32, scan_algo="fused",
                                lut_dtype=jnp.int8))
        dc, i_c = ivf_pq.search(
            idx, q, 10,
            ivf_pq.SearchParams(n_probes=32, scan_algo="cluster_major"))
        assert self._agree(i_f, i_c, 10) >= 0.85
        if metric == "sqeuclidean":
            np.testing.assert_allclose(
                np.sort(np.asarray(df), axis=1)[:, :5],
                np.sort(np.asarray(dc), axis=1)[:, :5], rtol=0.08, atol=1.0,
            )

    def test_refined_recall(self):
        from cuvs_tpu.neighbors import ivf_pq, refine
        from tests.utils import naive_knn, calc_recall

        idx, x, q = self._build()
        _, cand = ivf_pq.search(
            idx, q, 40, ivf_pq.SearchParams(n_probes=32, scan_algo="fused"))
        dv, di = refine.refine(x, q, cand, 10)
        gtd, gti = naive_knn(q, x, 10)
        rec = calc_recall(np.asarray(di), gti, np.asarray(dv), gtd)
        assert rec >= 0.95, rec

    @pytest.mark.parametrize("metric", ["sqeuclidean", "inner_product"])
    def test_bitset_filter(self, metric):
        """Bitset filter folds into the fused PQ kernel's penalty channel
        (use_pen for IP): results must never contain filtered-out ids and
        must agree with the unfused filtered scan."""
        import jax.numpy as jnp
        from cuvs_tpu.neighbors import filters, ivf_pq

        idx, x, q = self._build(metric=metric)
        rng = np.random.default_rng(5)
        keep = rng.random(x.shape[0]) < 0.7
        flt = filters.from_mask(jnp.asarray(keep))
        df, i_f = ivf_pq.search(
            idx, q, 10, ivf_pq.SearchParams(n_probes=32, scan_algo="fused"),
            prefilter=flt)
        i_f, df = np.asarray(i_f), np.asarray(df)
        assert keep[i_f].all() or not np.isfinite(df).all()
        dc, i_c = ivf_pq.search(
            idx, q, 10,
            ivf_pq.SearchParams(n_probes=32, scan_algo="cluster_major"),
            prefilter=flt)
        assert self._agree(i_f, i_c, 10) >= 0.9

    def test_bitmap_filter(self):
        """Per-query bitmap rides the post-scan overfetch pass."""
        import jax.numpy as jnp
        from cuvs_tpu.neighbors import filters, ivf_pq

        idx, x, q = self._build()
        rng = np.random.default_rng(6)
        keep = rng.random((q.shape[0], x.shape[0])) < 0.7
        flt = filters.from_mask(jnp.asarray(keep))
        df, i_f = ivf_pq.search(
            idx, q, 10, ivf_pq.SearchParams(n_probes=32, scan_algo="fused"),
            prefilter=flt)
        i_f = np.asarray(i_f)
        ok = np.isfinite(np.asarray(df))
        assert keep[np.arange(q.shape[0])[:, None], i_f][ok].all()


class TestFusedRaBitQScan:
    """Fused RaBitQ scan (interpret mode on CPU): in-VMEM bit-extract
    decode + estimator epilogue vs the query-major scan (reference
    analog: bitwise_emit_distances_kernel.cu.in:85-108)."""

    def _run(self, metric="sqeuclidean", bits=3, n=4000, d=32, nq=64):
        from cuvs_tpu.neighbors import ivf_rabitq

        rng = np.random.default_rng(13)
        x = make_blobs(rng, n, d)
        q = make_blobs(rng, nq, d)
        idx = ivf_rabitq.build(x, n_lists=16, bits_per_dim=bits, seed=0,
                               metric=metric)
        assert idx.sorted_codes_t is not None
        df, i_f = ivf_rabitq.search(
            idx, q, 10,
            ivf_rabitq.SearchParams(n_probes=16, scan_algo="fused"))
        dq, i_q = ivf_rabitq.search(
            idx, q, 10,
            ivf_rabitq.SearchParams(n_probes=16, scan_algo="query_major",
                                    compute_dtype=np.float32))
        agree = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(np.asarray(i_f), np.asarray(i_q))
        ])
        return agree, df, dq

    def test_l2_bits3_matches_query_major(self):
        # bits=3 exercises word-straddling codes (32 % 3 != 0)
        agree, df, dq = self._run(bits=3)
        assert agree >= 0.9, agree
        np.testing.assert_allclose(
            np.sort(np.asarray(df), axis=1)[:, :5],
            np.sort(np.asarray(dq), axis=1)[:, :5], rtol=0.05, atol=0.5,
        )

    def test_l2_bits1(self):
        agree, _, _ = self._run(bits=1)
        assert agree >= 0.85, agree

    def test_inner_product(self):
        agree, _, _ = self._run(metric="inner_product")
        assert agree >= 0.9, agree

    @pytest.mark.parametrize("metric", ["sqeuclidean", "inner_product"])
    def test_bitset_filter(self, metric):
        """Bitset filter folds into fa: filtered rows never returned."""
        import jax.numpy as jnp
        from cuvs_tpu.neighbors import filters, ivf_rabitq

        rng = np.random.default_rng(17)
        x = make_blobs(rng, 4000, 32)
        q = make_blobs(rng, 64, 32)
        idx = ivf_rabitq.build(x, n_lists=16, bits_per_dim=3, seed=0,
                               metric=metric)
        keep = rng.random(x.shape[0]) < 0.6
        flt = filters.from_mask(jnp.asarray(keep))
        df, i_f = ivf_rabitq.search(
            idx, q, 10,
            ivf_rabitq.SearchParams(n_probes=16, scan_algo="fused"),
            prefilter=flt)
        i_f = np.asarray(i_f)
        ok = np.isfinite(np.asarray(df)) if metric != "inner_product" \
            else np.isfinite(np.asarray(df)) & (np.asarray(df) != -np.inf)
        assert keep[i_f][ok].all()
        dq, i_q = ivf_rabitq.search(
            idx, q, 10,
            ivf_rabitq.SearchParams(n_probes=16, scan_algo="query_major",
                                    compute_dtype=np.float32),
            prefilter=flt)
        agree = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(i_f, np.asarray(i_q))
        ])
        assert agree >= 0.85, agree
