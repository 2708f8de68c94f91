"""ScaNN-style build-only index: AVQ partitioning + SOAR + PQ.

Reference: ``cuvs::neighbors::scann``
(/root/reference/cpp/include/cuvs/neighbors/scann.hpp — build :295-300,
serialize :320, partitioning_eta :51-76, soar_lambda + soar_labels :200;
impl cpp/src/neighbors/scann/detail/{scann_avq,scann_soar,scann_quantize,
scann_build,scann_serialize}.cuh). Like the reference, this is
**build + serialize only** — serving happens in CPU ScaNN (SURVEY.md
Appendix A).

Math background ("Accelerating Large-Scale Inference with Anisotropic
Vector Quantization", ICML 2020):
  * AVQ centroids minimize eta-weighted parallel loss + orthogonal loss;
    the closed-form per-cluster update solves
    (Σ_x [ (eta-1)/||x||² x xᵀ + I ]) c = Σ_x eta·x   — here vmapped over
    clusters as batched d×d solves on the MXU.
  * SOAR assigns each point a second partition scored by
    d(x, c2)² + λ·((x-c2)·r̂1)² where r̂1 is the primary residual
    direction — spilled assignments de-correlate quantization errors.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cuvs_tpu.cluster import kmeans_balanced
from cuvs_tpu.distance import pairwise
from cuvs_tpu.distance.pairwise import DistanceType, normalize_metric


@dataclasses.dataclass(frozen=True)
class IndexParams:
    """Mirrors scann::index_params (scann.hpp:51-200)."""

    n_lists: int = 1024
    metric: DistanceType = DistanceType.InnerProduct
    partitioning_eta: float = 1.0  # anisotropic weight (1.0 = isotropic)
    soar_lambda: float = 1.5
    spilling: bool = True
    pq_dim: int = 0  # 0 = dim/2
    pq_bits: int = 8
    kmeans_n_iters: int = 20
    bf16_residuals: bool = False  # store bf16 residuals instead of PQ
    seed: int = 0

    def __post_init__(self):
        object.__setattr__(self, "metric", normalize_metric(self.metric))


@dataclasses.dataclass
class Index:
    centers: np.ndarray  # [n_lists, d] AVQ partition centroids
    labels: np.ndarray  # [n] primary assignment
    soar_labels: Optional[np.ndarray]  # [n] secondary (spilled) assignment
    codes: Optional[np.ndarray]  # [n, pq_dim] uint8 PQ codes of residuals
    pq_codebooks: Optional[np.ndarray]  # [pq_dim, book, pq_len]
    residuals_bf16: Optional[np.ndarray]  # alternative storage
    params: IndexParams = None

    @property
    def size(self):
        return self.labels.shape[0]


def _avq_refine(x, centers, labels, eta):
    """One anisotropic centroid update (scann_avq.cuh semantics)."""
    n, d = x.shape
    k = centers.shape[0]
    nrm2 = jnp.maximum(jnp.sum(x * x, axis=1), 1e-30)
    w = (eta - 1.0) / nrm2  # per-point anisotropic weight
    # per-cluster accumulate A = Σ w x xᵀ + count·I ; b = Σ eta·x
    outer = (x[:, :, None] * x[:, None, :]) * w[:, None, None]
    A = jax.ops.segment_sum(outer, labels, num_segments=k)
    counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), labels, k)
    A = A + counts[:, None, None] * jnp.eye(d)[None]
    b = jax.ops.segment_sum(x * eta, labels, k)
    sol = jnp.linalg.solve(A + 1e-6 * jnp.eye(d)[None], b[:, :, None])[:, :, 0]
    return jnp.where(counts[:, None] > 0, sol, centers)


def _soar_assign(x, centers, labels, lam):
    """Secondary assignments (scann_soar.cuh): argmin over c2 != c1 of
    ||x - c2||² + λ ((x - c2)·r̂1)²."""
    r1 = x - centers[labels]
    r1_hat = r1 / jnp.maximum(jnp.linalg.norm(r1, axis=1, keepdims=True), 1e-30)
    # d2[i, c] = ||x_i - c||² ; proj[i, c] = (x_i - c)·r̂1_i
    d2 = (
        jnp.sum(x * x, 1)[:, None]
        + jnp.sum(centers * centers, 1)[None, :]
        - 2.0 * pairwise._gemm(x, centers, jnp.float32)
    )
    proj = jnp.sum(x * r1_hat, axis=1)[:, None] - pairwise._gemm(r1_hat, centers, jnp.float32)
    score = d2 + lam * proj * proj
    score = score.at[jnp.arange(x.shape[0]), labels].set(jnp.inf)
    return jnp.argmin(score, axis=1).astype(jnp.int32)


def build(dataset, params: Optional[IndexParams] = None, **kw) -> Index:
    if params is None:
        params = IndexParams(**kw)
    x = jnp.asarray(dataset, jnp.float32)
    n, d = x.shape
    n_lists = min(params.n_lists, n)

    centers = kmeans_balanced.fit(
        x, n_lists,
        kmeans_balanced.BalancedParams(
            n_clusters=n_lists, n_iters=params.kmeans_n_iters, seed=params.seed
        ),
    )
    labels = kmeans_balanced.predict(x, centers)
    if params.partitioning_eta != 1.0:
        centers = _avq_refine(x, centers, labels, params.partitioning_eta)
        labels = kmeans_balanced.predict(x, centers)

    soar = None
    if params.spilling and n_lists > 1:
        soar = np.asarray(_soar_assign(x, centers, labels, params.soar_lambda))

    residuals = x - centers[labels]
    codes = books = res_bf16 = None
    if params.bf16_residuals:
        res_bf16 = np.asarray(residuals.astype(jnp.bfloat16))
    else:
        from cuvs_tpu.preprocessing import quantize as q

        pq_dim = params.pq_dim or max(1, d // 2)
        pqq = q.pq_train(np.asarray(residuals), pq_dim, params.pq_bits,
                         seed=params.seed)
        codes = np.asarray(q.pq_transform(pqq, np.asarray(residuals)))
        books = np.asarray(pqq.codebooks)

    return Index(
        centers=np.asarray(centers),
        labels=np.asarray(labels),
        soar_labels=soar,
        codes=codes,
        pq_codebooks=books,
        residuals_bf16=res_bf16,
        params=params,
    )


def serialize(index: Index, directory: str) -> None:
    """Write the index as a ScaNN-style asset directory.

    The reference emits ScaNN's protobuf assets (scann_serialize.cuh);
    exact proto-level parity is pending — this writes the same logical
    assets (partitioner, datapoint->partition maps, PQ codebooks/codes)
    as documented .npy files plus a JSON manifest.
    """
    os.makedirs(directory, exist_ok=True)
    np.save(os.path.join(directory, "partition_centroids.npy"), index.centers)
    np.save(os.path.join(directory, "datapoint_partitions.npy"), index.labels)
    if index.soar_labels is not None:
        np.save(os.path.join(directory, "soar_partitions.npy"), index.soar_labels)
    if index.codes is not None:
        np.save(os.path.join(directory, "hashed_dataset.npy"), index.codes)
        np.save(os.path.join(directory, "pq_codebooks.npy"), index.pq_codebooks)
    if index.residuals_bf16 is not None:
        np.save(
            os.path.join(directory, "bf16_dataset.npy"),
            index.residuals_bf16.astype(np.float32),
        )
    manifest = {
        "format": "cuvs_tpu.scann.v1",
        "n_lists": int(index.centers.shape[0]),
        "dim": int(index.centers.shape[1]),
        "n_rows": int(index.size),
        "metric": int(index.params.metric),
        "soar_lambda": index.params.soar_lambda,
        "partitioning_eta": index.params.partitioning_eta,
        "pq_bits": index.params.pq_bits,
        "seed": index.params.seed,
    }
    with open(os.path.join(directory, "scann_config.json"), "w") as f:
        json.dump(manifest, f, indent=2)


def deserialize(directory: str) -> Index:
    """Read a ScaNN asset directory written by :func:`serialize` back into
    an :class:`Index` (round-trip verification; the reference's assets are
    likewise reloadable by CPU ScaNN)."""
    with open(os.path.join(directory, "scann_config.json")) as f:
        manifest = json.load(f)
    if manifest.get("format") != "cuvs_tpu.scann.v1":
        raise ValueError("not a cuvs_tpu scann asset directory")

    def opt(name):
        p = os.path.join(directory, name)
        return np.load(p) if os.path.exists(p) else None

    centers = np.load(os.path.join(directory, "partition_centroids.npy"))
    labels = np.load(os.path.join(directory, "datapoint_partitions.npy"))
    soar = opt("soar_partitions.npy")
    codes = opt("hashed_dataset.npy")
    books = opt("pq_codebooks.npy")
    res_bf16 = opt("bf16_dataset.npy")
    params = IndexParams(
        n_lists=manifest["n_lists"],
        metric=DistanceType(manifest["metric"]),
        partitioning_eta=manifest["partitioning_eta"],
        soar_lambda=manifest["soar_lambda"],
        spilling=soar is not None,
        pq_bits=manifest.get("pq_bits", 8),
        bf16_residuals=res_bf16 is not None,
        seed=manifest.get("seed", 0),
    )
    return Index(
        centers=centers,
        labels=labels,
        soar_labels=soar,
        codes=codes,
        pq_codebooks=books,
        residuals_bf16=res_bf16,
        params=params,
    )
