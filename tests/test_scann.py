import json
import os

import numpy as np

from cuvs_tpu.neighbors import scann
from tests.utils import make_blobs

RNG = np.random.default_rng(91)


def test_build_and_assets(tmp_path):
    x = make_blobs(RNG, 5000, 32)
    idx = scann.build(
        x, n_lists=32, partitioning_eta=2.0, soar_lambda=1.5, pq_dim=16, seed=0
    )
    assert idx.centers.shape == (32, 32)
    assert idx.labels.shape == (5000,)
    assert idx.soar_labels is not None
    # SOAR assignment differs from primary
    assert (idx.soar_labels != idx.labels).all()
    assert idx.codes.shape == (5000, 16)

    d = str(tmp_path / "scann_assets")
    scann.serialize(idx, d)
    for f in (
        "partition_centroids.npy",
        "datapoint_partitions.npy",
        "soar_partitions.npy",
        "hashed_dataset.npy",
        "pq_codebooks.npy",
        "scann_config.json",
    ):
        assert os.path.exists(os.path.join(d, f)), f
    cfg = json.load(open(os.path.join(d, "scann_config.json")))
    assert cfg["n_lists"] == 32 and cfg["n_rows"] == 5000


def test_partition_quality():
    x = make_blobs(RNG, 4000, 16, n_centers=16)
    idx = scann.build(x, n_lists=16, partitioning_eta=1.0, spilling=False, seed=0)
    # partitions should give small residuals vs data scale
    res = x - idx.centers[idx.labels]
    assert np.linalg.norm(res) < 0.5 * np.linalg.norm(x)


def test_avq_eta_changes_centroids():
    x = make_blobs(RNG, 2000, 8)
    a = scann.build(x, n_lists=8, partitioning_eta=1.0, spilling=False, seed=0)
    b = scann.build(x, n_lists=8, partitioning_eta=3.0, spilling=False, seed=0)
    assert not np.allclose(a.centers, b.centers)


def test_bf16_storage():
    x = make_blobs(RNG, 1000, 8)
    idx = scann.build(x, n_lists=8, bf16_residuals=True, spilling=False, seed=0)
    assert idx.codes is None and idx.residuals_bf16 is not None
