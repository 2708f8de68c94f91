"""Host-offloaded sharded index: datasets larger than device memory
stream through the chip shard at a time (SURVEY.md §5 dataset-scale
ladder; single-chip complement to cuvs_tpu.mg)."""

import numpy as np
import pytest

from cuvs_tpu.neighbors import offload
from tests.utils import naive_knn, calc_recall, make_blobs

RNG = np.random.default_rng(55)


def test_offload_bf_exact():
    x = make_blobs(RNG, 6000, 24)
    q = make_blobs(RNG, 32, 24)
    idx = offload.build(x, algo="brute_force", n_shards=4)
    assert len(idx.shards) == 4 and idx.size == 6000
    # shard leaves live on host
    assert isinstance(idx.shards[0].dataset, np.ndarray)
    d, i = offload.search(idx, q, 10)
    gtd, gti = naive_knn(q, x, 10)
    assert calc_recall(i, gti, d, gtd) >= 0.999
    np.testing.assert_allclose(d, gtd, rtol=1e-3, atol=1e-3)


def test_offload_ivf_pq_from_reader(tmp_path):
    """Out-of-core build path: shards read from a .fbin file reader."""
    from cuvs_tpu import io as cio

    x = make_blobs(RNG, 8000, 32)
    q = make_blobs(RNG, 24, 32)
    p = str(tmp_path / "base.fbin")
    cio.write_bin(p, x)
    with cio.BinDataset(p) as reader:
        idx = offload.build(reader, algo="ivf_pq", n_shards=3,
                            n_lists=16, pq_dim=16, seed=0)
    assert idx.size == 8000
    d, cand = offload.search(idx, q, 30, n_probes=16)
    from cuvs_tpu.neighbors import refine

    rd, ri = refine.refine(x, q, cand, 10)
    gtd, gti = naive_knn(q, x, 10)
    assert calc_recall(np.asarray(ri), gti) >= 0.9


def test_offload_roundtrip(tmp_path):
    x = make_blobs(RNG, 3000, 16)
    q = make_blobs(RNG, 8, 16)
    idx = offload.build(x, algo="ivf_flat", n_shards=2, n_lists=8, seed=0)
    d1, i1 = offload.search(idx, q, 5, n_probes=8)
    p = str(tmp_path / "offload")
    offload.save(p, idx)
    idx2 = offload.load(p)
    d2, i2 = offload.search(idx2, q, 5, n_probes=8)
    np.testing.assert_array_equal(i1, i2)


def test_host_refined_index():
    """Device quantized ranking + host exact re-rank as a library
    surface (the single-chip 100M serving shape, docs/scale.md)."""
    x = make_blobs(RNG, 6000, 24)
    q = make_blobs(RNG, 32, 24)
    idx = offload.build_host_refined(
        x, algo="ivf_flat", n_lists=16, seed=0, storage_dtype=np.int8)
    d, i = offload.search_refined(idx, q, 10, refine_ratio=4, n_probes=16)
    gtd, gti = naive_knn(q, x, 10)
    assert calc_recall(np.asarray(i), gti, np.asarray(d), gtd) >= 0.95
