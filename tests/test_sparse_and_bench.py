import numpy as np
import pytest

from tests.utils import naive_knn, calc_recall


def _random_csr(rng, n, d, density=0.05):
    import scipy.sparse as sp

    m = sp.random(n, d, density=density, random_state=np.random.RandomState(1),
                  format="csr", dtype=np.float32)
    return m


def test_sparse_bf_matches_dense():
    from cuvs_tpu.neighbors import sparse_brute_force as sbf

    rng = np.random.default_rng(3)
    x = _random_csr(rng, 800, 500)
    q = _random_csr(rng, 30, 500)
    idx = sbf.from_scipy(x)
    d, i = sbf.search(idx, q.indptr, q.indices, q.data, 10,
                      index_block=300, feature_tile=200)
    gtd, gti = naive_knn(q.toarray(), x.toarray(), 10)
    assert calc_recall(i, gti, d, gtd) >= 0.999
    np.testing.assert_allclose(d, gtd, rtol=1e-3, atol=1e-4)


def test_sparse_bf_inner_product():
    from cuvs_tpu.neighbors import sparse_brute_force as sbf

    rng = np.random.default_rng(4)
    x = _random_csr(rng, 500, 300)
    q = _random_csr(rng, 10, 300)
    idx = sbf.from_scipy(x, metric="inner_product")
    d, i = sbf.search(idx, q.indptr, q.indices, q.data, 5)
    gtd, gti = naive_knn(q.toarray(), x.toarray(), 5, metric="inner_product")
    assert calc_recall(i, gti) >= 0.99


@pytest.mark.parametrize("metric", [
    "l1", "linf", "canberra", "hellinger", "jaccard", "dice", "russellrao",
    "hamming", "jensenshannon", "braycurtis",
])
def test_sparse_semiring_tail_matches_dense(metric):
    """The full sparse semiring metric set (sparse_distance.cu) against the
    dense pairwise reference on densified data."""
    from cuvs_tpu.distance.pairwise import pairwise_distance
    from cuvs_tpu.neighbors import sparse_brute_force as sbf

    rng = np.random.default_rng(5)
    x = _random_csr(rng, 300, 120, density=0.15)
    q = _random_csr(rng, 8, 120, density=0.15)
    if metric in ("hellinger", "jensenshannon"):
        # probability-like inputs (non-negative rows); scipy.random is
        # already non-negative uniform
        pass
    idx = sbf.from_scipy(x, metric=metric)
    d, i = sbf.search(idx, q.indptr, q.indices, q.data, 5,
                      index_block=128, feature_tile=64)
    dense = np.asarray(pairwise_distance(q.toarray(), x.toarray(), metric=metric))
    gti = np.argsort(dense, axis=1, kind="stable")[:, :5]
    gtd = np.take_along_axis(dense, gti, axis=1)
    np.testing.assert_allclose(d, gtd, rtol=2e-3, atol=2e-3)


def test_bench_yaml_config_sweep(tmp_path):
    """YAML sweep configs with constraint hooks (config/algos/*.yaml
    analog): invalid combos are dropped, rows carry build+search params."""
    from cuvs_tpu.bench import runner

    rows = runner.run_config(
        "ivf_flat", "synthetic-100k-96", group="tiny", k=5,
        max_rows=2000, gt_queries=32, reps=1, cache_dir=str(tmp_path),
    )
    assert len(rows) == 3  # 1 build combo x 3 n_probes
    assert all(r.params["build"] == {"n_lists": 16} for r in rows)
    assert {r.params["search"]["n_probes"] for r in rows} == {2, 8, 16}
    assert all(r.qps > 0 and 0 <= r.recall <= 1 for r in rows)
    # constraint hook drops invalid combos (pq_dim > dims)
    from cuvs_tpu.bench import constraints

    assert not constraints.ivf_pq_build({"pq_dim": 999}, 96)
    assert constraints.ivf_pq_build({"pq_dim": 48}, 96)


def test_bench_runner_and_pareto(tmp_path):
    from cuvs_tpu.bench import runner

    rows = runner.run(
        "synthetic-100k-96",
        "ivf_flat",
        build_params={"n_lists": 16, "seed": 0},
        search_grid={"n_probes": [2, 16]},
        k=10,
        max_rows=5000,
        gt_queries=128,
        reps=1,
        cache_dir=str(tmp_path),
    )
    assert len(rows) == 2
    r2, r16 = rows
    assert r16.recall >= r2.recall
    assert all(r.qps > 0 and r.latency_ms > 0 for r in rows)
    front = runner.pareto(rows)
    assert front[0].recall == max(r.recall for r in rows)
    p = str(tmp_path / "rows.csv")
    runner.write_csv(rows, p)
    import csv

    got = list(csv.DictReader(open(p)))
    assert len(got) == 2 and got[0]["algo"] == "ivf_flat"


def test_bench_dataset_registry():
    from cuvs_tpu.bench import datasets

    ds = datasets.load("synthetic-100k-96", max_rows=1000)
    assert ds.base.shape == (1000, 96)
    assert ds.synthetic
    with pytest.raises(ValueError):
        datasets.load("no-such-dataset")


def test_groundtruth_cache(tmp_path):
    from cuvs_tpu.bench import datasets

    ds = datasets.load("synthetic-100k-96", max_rows=2000)
    d1, i1 = datasets.groundtruth(ds, k=5, gt_queries=32, cache_dir=str(tmp_path))
    d2, i2 = datasets.groundtruth(ds, k=5, gt_queries=32, cache_dir=str(tmp_path))
    np.testing.assert_array_equal(i1, i2)


def test_truncated_load_drops_provided_groundtruth(tmp_path, monkeypatch):
    """A max_rows-truncated base must not keep the full-base .ibin gt
    (recall would be scored against ids missing from the index)."""
    from cuvs_tpu.bench import datasets

    spec = datasets.REGISTRY["test-data"]
    root = tmp_path
    for rel in (spec.base_file, spec.query_file, spec.gt_file):
        (root / rel).parent.mkdir(parents=True, exist_ok=True)

    def write_bin(rel, arr):
        with open(root / rel, "wb") as f:
            np.asarray(arr.shape, np.uint32).tofile(f)
            arr.tofile(f)

    rng = np.random.default_rng(0)
    write_bin(spec.base_file,
              rng.standard_normal((spec.n_base, spec.dims)).astype(np.float32))
    write_bin(spec.query_file,
              rng.standard_normal((8, spec.dims)).astype(np.float32))
    write_bin(spec.gt_file, rng.integers(0, spec.n_base, (8, 10)).astype(np.int32))
    monkeypatch.setenv("CUVS_TPU_DATASET_DIR", str(root))

    full = datasets.load("test-data")
    assert full.gt_ids is not None and not full.synthetic
    cut = datasets.load("test-data", max_rows=1000)
    assert cut.base.shape[0] == 1000
    assert cut.gt_ids is None


def test_hnsw_cpu_competitor():
    """CPU HNSW baseline (native/hnsw_baseline.cpp): recall sanity on
    blobs + the bench seam the reference gets from its hnswlib wrapper."""
    from cuvs_tpu.bench.competitors import HnswCpu
    from tests.utils import naive_knn, calc_recall, make_blobs

    rng = np.random.default_rng(23)
    x = make_blobs(rng, 5000, 32)
    q = make_blobs(rng, 64, 32)
    h = HnswCpu(M=16, ef_construction=100, seed=0).build(x)
    # blob data needs a wide beam to bridge clusters (classic HNSW
    # behavior; uniform data clears 0.98 at ef=64)
    d, i = h.search(q, 10, ef=256)
    gtd, gti = naive_knn(q, x, 10)
    rec = calc_recall(i, gti, d, gtd)
    assert rec >= 0.9, rec
    assert h.build_seconds is not None


def test_plot_pareto_and_export(tmp_path):
    from cuvs_tpu.bench import plot
    from cuvs_tpu.bench.runner import Row

    rows = [
        Row("ivf_flat", "ds", 1.0, {"n_probes": p}, r, q, 1000.0 / q)
        for p, r, q in [(8, 0.8, 5000), (16, 0.9, 3000), (32, 0.95, 1500)]
    ] + [
        Row("hnsw_cpu", "ds", 2.0, {"ef": e}, r, q, 1000.0 / q)
        for e, r, q in [(32, 0.85, 800), (64, 0.93, 400)]
    ]
    png = str(tmp_path / "pareto.png")
    plot.plot_pareto(rows, png)
    assert __import__("os").path.getsize(png) > 1000
    csvp = str(tmp_path / "rows.csv")
    plot.export_csv(rows, csvp)
    jp = str(tmp_path / "rows.json")
    plot.export_json(rows, jp)
    import json as _json

    data = _json.load(open(jp))
    assert len(data["benchmarks"]) == 5
    assert data["benchmarks"][0]["items_per_second"] == 5000
