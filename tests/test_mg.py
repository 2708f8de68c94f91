"""Multi-chip tests on the 8-device virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8), mirroring the reference's
"SNMG tests on whatever local devices exist" strategy (SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from cuvs_tpu import mg
from cuvs_tpu.neighbors import filters
from tests.utils import naive_knn, calc_recall, make_blobs

RNG = np.random.default_rng(41)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("algo", ["brute_force", "ivf_flat", "cagra"])
def test_sharded_search(algo):
    n = 8000
    x = (RNG.standard_normal((n, 24)) * 2).astype(np.float32)
    q = (RNG.standard_normal((64, 24)) * 2).astype(np.float32)
    kw = {}
    if algo == "ivf_flat":
        kw = dict(n_lists=16, seed=0)
    elif algo == "cagra":
        kw = dict(intermediate_graph_degree=48, graph_degree=24, seed=0)
    idx = mg.build(x, algo=algo, mode="sharded", **kw)
    skw = {}
    if algo == "ivf_flat":
        skw = dict(n_probes=16)
    d, i = mg.search(idx, q, 10, **skw)
    gtd, gti = naive_knn(q, x, 10)
    recall = calc_recall(np.asarray(i), gti, np.asarray(d), gtd)
    floor = {"brute_force": 0.999, "ivf_flat": 0.999, "cagra": 0.85}[algo]
    assert recall >= floor, (algo, recall)


def test_sharded_matches_single_for_bf():
    n = 4003  # deliberately not divisible by 8
    x = make_blobs(RNG, n, 16)
    q = make_blobs(RNG, 20, 16)
    idx = mg.build(x, algo="brute_force", mode="sharded")
    d, i = mg.search(idx, q, 10)
    gtd, gti = naive_knn(q, x, 10)
    np.testing.assert_allclose(np.asarray(d), gtd, rtol=1e-3, atol=1e-3)
    assert calc_recall(np.asarray(i), gti) >= 0.999


def test_replicated_search():
    x = make_blobs(RNG, 4000, 16)
    q = make_blobs(RNG, 100, 16)
    idx = mg.build(x, algo="brute_force", mode="replicated")
    d, i = mg.search(idx, q, 10)
    gtd, gti = naive_knn(q, x, 10)
    assert calc_recall(np.asarray(i), gti) >= 0.999


def test_replicated_round_robin():
    x = make_blobs(RNG, 4000, 16)
    q = make_blobs(RNG, 64, 16)
    idx = mg.build(x, algo="brute_force", mode="replicated")
    gtd, gti = naive_knn(q, x, 10)
    from cuvs_tpu.mg import snmg

    seen = set()
    for _ in range(3):  # consecutive batches land on successive devices
        before = snmg._rr_counter[0]
        d, i = mg.search(idx, q, 10, routing="round_robin")
        assert snmg._rr_counter[0] == before + 1
        seen.add(before % len(jax.devices()))
        assert calc_recall(np.asarray(i), gti) >= 0.999
    assert len(seen) == 3


def test_ivf_flat_distributed_build_matches_loop_build():
    n = 8000
    x = make_blobs(RNG, n, 16)
    q = make_blobs(RNG, 48, 16)
    fast = mg.build(x, algo="ivf_flat", mode="sharded", n_lists=16, seed=0)
    slow = mg.build(
        x, algo="ivf_flat", mode="sharded", distributed_build="off",
        n_lists=16, seed=0,
    )
    df, i_f = mg.search(fast, q, 10, n_probes=16)
    ds, i_s = mg.search(slow, q, 10, n_probes=16)
    gtd, gti = naive_knn(q, x, 10)
    # both are exact at n_probes = n_lists
    assert calc_recall(np.asarray(i_f), gti, np.asarray(df), gtd) >= 0.999
    assert calc_recall(np.asarray(i_s), gti, np.asarray(ds), gtd) >= 0.999


def test_sharded_prefilter():
    x = make_blobs(RNG, 3000, 16)
    q = make_blobs(RNG, 16, 16)
    keep = RNG.random(3000) > 0.5
    idx = mg.build(x, algo="brute_force", mode="sharded")
    d, i = mg.search(idx, q, 10, prefilter=filters.from_mask(keep))
    i, d = np.asarray(i), np.asarray(d)
    assert keep[i[np.isfinite(d)]].all()


def test_mg_kmeans_matches_quality():
    from cuvs_tpu.cluster import kmeans

    # own RNG: k-means quality is a local optimum and data-dependent —
    # mg/sg trajectories legitimately diverge on hard draws (both
    # directions), so the comparison only holds on a pinned easy draw
    rng = np.random.default_rng(0)
    x = make_blobs(rng, 8000, 16, n_centers=8)
    centers_mg, inertia_mg = mg.kmeans_fit(x, 8, seed=1)
    _, _, inertia_sg, _ = kmeans.fit(x, n_clusters=8, seed=1)
    assert centers_mg.shape == (8, 16)
    assert float(inertia_mg) <= float(inertia_sg) * 1.05


def test_mg_serialize_roundtrip(tmp_path):
    x = make_blobs(RNG, 2000, 16)
    q = make_blobs(RNG, 16, 16)
    idx = mg.build(x, algo="brute_force", mode="sharded")
    d1, i1 = mg.search(idx, q, 5)
    from cuvs_tpu.mg import snmg

    p = str(tmp_path / "mgidx")
    snmg.save(p, idx)
    loaded = snmg.load(p)
    d2, i2 = mg.search(loaded, q, 5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_ivf_flat_distributed_build_honors_storage_dtype():
    import jax.numpy as jnp

    n = 8000
    x = make_blobs(RNG, n, 16)
    q = make_blobs(RNG, 48, 16)
    idx = mg.build(x, algo="ivf_flat", mode="sharded", n_lists=16, seed=0,
                   storage_dtype=jnp.int8)
    assert idx.shards.sorted_data.dtype == jnp.int8
    assert idx.shards.q_scale is not None
    d, i = mg.search(idx, q, 10, n_probes=16)
    gtd, gti = naive_knn(q, x, 10)
    # int8-quantized ranking: floor reflects quantization error, not bugs
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.9


@pytest.mark.slow
def test_sharded_recall_at_scale():
    """Sharded IVF at 8 x 250k rows with a recall@10 floor — makes the
    'multi-chip composition clears the recall bar' claim checkable on the
    virtual mesh (VERDICT r2 #5; snmg.cuh:561-650 analog). 8 x 100k rows
    — sized to finish on the single weak host core driving the mesh."""
    rng = np.random.default_rng(5)
    n, d, nq = 800_000, 32, 256
    r = 8
    proj = rng.standard_normal((r, d)).astype(np.float32) / np.sqrt(r)
    x = rng.standard_normal((n, r), dtype=np.float32) @ proj
    x += 0.05 * rng.standard_normal((n, d), dtype=np.float32)
    q = rng.standard_normal((nq, r), dtype=np.float32) @ proj
    q += 0.05 * rng.standard_normal((nq, d), dtype=np.float32)

    idx = mg.build(x, algo="ivf_flat", mode="sharded", n_lists=128,
                   kmeans_n_iters=10, seed=0)
    d_, i_ = mg.search(idx, q, 10, n_probes=48)
    gtd, gti = naive_knn(q, x, 10)
    rec = calc_recall(np.asarray(i_), gti, np.asarray(d_), gtd)
    assert rec >= 0.95, rec


def test_multi_slice_mesh_sharded_search():
    """2-D mesh ('dcn', 'ici') — the multi-slice analog: sharding over the
    flattened axes, merge all_gather crossing both (SURVEY §2.4 multi-node
    row; kmeans_mg.cuh multi-node analog)."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dcn", "ici"))
    x = make_blobs(RNG, 4000, 16)
    q = make_blobs(RNG, 32, 16)
    idx = mg.build(x, algo="brute_force", mode="sharded", mesh=mesh)
    d, i = mg.search(idx, q, 10, mesh=mesh)
    gtd, gti = naive_knn(q, x, 10)
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.999

    centers, inertia = mg.kmeans_fit(x, 8, mesh=mesh, max_iter=5, seed=0)
    assert centers.shape == (8, 16)


def test_streaming_sharded_build():
    """mg.build_streaming: per-shard streaming int8 builds committed to
    their devices (the >HBM x n_chips tier); unequal slice sizes exercise
    the row unification."""
    rng = np.random.default_rng(4)
    slices = [
        rng.standard_normal((800 if i < 15 else 400, 96), dtype=np.float32)
        for i in range(16)
    ]
    x = np.concatenate(slices)
    q = rng.standard_normal((48, 96), dtype=np.float32)
    mesh = mg.default_mesh()
    idx = mg.build_streaming(lambda i: slices[i], 16, mesh=mesh, n_lists=16,
                             trainset_rows=1600)
    assert idx.n_rows == x.shape[0]
    assert len(idx.shards.sorted_data.sharding.device_set) == 8
    d, i = mg.search(idx, q, 10, mesh=mesh, n_probes=16)
    gtd, gti = naive_knn(q, x, 10)
    assert calc_recall(np.asarray(i), gti) >= 0.85


@pytest.mark.parametrize("algo", ["ivf_flat", "ivf_pq"])
def test_sharded_search_runs_fused_scan(algo, monkeypatch):
    """mg sharded search reaches the FUSED Pallas scans under shard_map
    (snmg.cuh:283 parity: SNMG ranks run the same fused kernels locally
    as single-GPU). The fused geometry is static (group_pairs_tiled), so
    scan_algo="fused" survives the traced context; interpret mode runs
    it on the CPU mesh."""
    from cuvs_tpu.neighbors import ivf_scan

    called = {"n": 0}
    target = ("cluster_major_scan_fused" if algo == "ivf_flat"
              else "cluster_major_scan_pq_fused")
    orig = getattr(ivf_scan, target)

    def spy(*a, **kw):
        called["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(ivf_scan, target, spy)

    n = 4096
    x = (RNG.standard_normal((n, 32)) * 2).astype(np.float32)
    q = (RNG.standard_normal((128, 32)) * 2).astype(np.float32)
    kw = dict(n_lists=8, seed=0)
    if algo == "ivf_pq":
        kw["pq_dim"] = 8
    idx = mg.build(x, algo=algo, mode="sharded", **kw)
    d, i = mg.search(idx, q, 10, n_probes=8, scan_algo="fused")
    assert called["n"] >= 1, "fused scan not reached under shard_map"
    gtd, gti = naive_knn(q, x, 10)
    floor = 0.95 if algo == "ivf_flat" else 0.70  # PQ is approximate
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= floor


def test_streaming_sharded_build_ivf_pq():
    """mg.build_streaming(algo="ivf_pq"): per-shard streaming PQ builds
    (mg_ivf_pq.h analog) searched through shard_map + merge, re-ranked
    with an exact refine — the BASELINE config-5 composition."""
    from cuvs_tpu.neighbors import refine

    rng = np.random.default_rng(11)
    slices = [rng.standard_normal((600, 48), dtype=np.float32)
              for _ in range(16)]
    x = np.concatenate(slices)
    q = x[rng.integers(0, x.shape[0], 48)] + 0.01 * rng.standard_normal(
        (48, 48)).astype(np.float32)
    mesh = mg.default_mesh()
    idx = mg.build_streaming(lambda i: slices[i], 16, mesh=mesh,
                             algo="ivf_pq", n_lists=8, pq_dim=12,
                             trainset_rows=1200)
    assert idx.algo == "ivf_pq"
    assert idx.n_rows == x.shape[0]
    d, i = mg.search(idx, q, 40, mesh=mesh, n_probes=8)
    dd, ii = refine.refine(x, q, np.asarray(i), 10)
    gtd, gti = naive_knn(q, x, 10)
    rec = calc_recall(np.asarray(ii), gti, np.asarray(dd), gtd)
    assert rec >= 0.9, rec
