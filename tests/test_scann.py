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
    # reference asset layout (scann_serialize.cuh:106-142)
    for f in (
        "cuvs_metadata.bin",
        "centers.npy",
        "datapoint_to_token.npy",
        "hashed_dataset.npy",
        "hashed_dataset_soar.npy",
        "pq_codebook.npy",
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


def test_asset_bytes_golden(tmp_path):
    """Byte-level check of the reference asset formats against a
    hand-built fixture (scann_serialize.cuh:56-142 semantics)."""
    import struct

    centers = np.arange(12, dtype=np.float32).reshape(3, 4)
    labels = np.array([0, 1, 2, 1], np.int32)
    soar = np.array([1, 1, 0, 2], np.int32)  # row 1: equal -> -1 on disk
    codes = np.array([[1, 2], [3, 4], [5, 6], [7, 8]], np.uint8)
    books = np.zeros((2, 4, 2), np.float32)
    idx = scann.Index(
        centers=centers, labels=labels, soar_labels=soar, codes=codes,
        pq_codebooks=books, residuals_bf16=None, codes_soar=codes,
        params=scann.IndexParams(n_lists=3, pq_dim=2),
    )
    d = str(tmp_path / "assets")
    scann.serialize(idx, d)

    meta = open(os.path.join(d, "cuvs_metadata.bin"), "rb").read()
    assert meta == struct.pack("<iII", 1, 4, 2)  # version, dim, pq_dim

    tok = np.load(os.path.join(d, "datapoint_to_token.npy"))
    assert tok.dtype == np.int32
    # interleaved (primary, soar), soar = -1 where equal
    np.testing.assert_array_equal(tok, [0, 1, 1, -1, 2, 0, 1, 2])

    hashed = np.load(os.path.join(d, "hashed_dataset.npy"))
    assert hashed.dtype == np.uint8
    np.testing.assert_array_equal(hashed, codes)

    idx2 = scann.deserialize(d)
    np.testing.assert_array_equal(idx2.labels, labels)
    np.testing.assert_array_equal(idx2.soar_labels, soar)


def test_soar_codes_and_bf16_dataset(tmp_path):
    x = make_blobs(RNG, 1200, 16)
    idx = scann.build(x, n_lists=8, pq_dim=8, reordering_bf16=True, seed=0)
    assert idx.codes_soar is not None and idx.codes_soar.shape == idx.codes.shape
    assert (idx.codes_soar != idx.codes).any()
    assert idx.bf16_dataset is not None
    d = str(tmp_path / "assets")
    scann.serialize(idx, d)
    bf = np.load(os.path.join(d, "bf16_dataset.npy"))
    assert bf.dtype == np.int16  # OSS ScaNN expects int16 bit patterns
    idx2 = scann.deserialize(d)
    np.testing.assert_array_equal(
        np.asarray(idx2.bf16_dataset).view(np.uint16),
        np.asarray(idx.bf16_dataset).view(np.uint16),
    )
