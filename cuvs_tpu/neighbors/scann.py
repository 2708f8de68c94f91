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
    reordering_bf16: bool = False  # also keep a bf16 dataset copy
    # (scann.hpp:70-71) for ScaNN's exact re-rank stage
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
    codes_soar: Optional[np.ndarray] = None  # [n, pq_dim] codes of the
    # residuals vs the SOAR center (scann_build.cuh:214-223)
    bf16_dataset: Optional[np.ndarray] = None  # [n, d] bf16 dataset copy
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
    codes = books = res_bf16 = codes_soar = None
    if params.bf16_residuals:
        res_bf16 = np.asarray(residuals.astype(jnp.bfloat16))
    else:
        from cuvs_tpu.preprocessing import quantize as q

        pq_dim = params.pq_dim or max(1, d // 2)
        pqq = q.pq_train(np.asarray(residuals), pq_dim, params.pq_bits,
                         seed=params.seed)
        codes = np.asarray(q.pq_transform(pqq, np.asarray(residuals)))
        books = np.asarray(pqq.codebooks)
        if soar is not None:
            # SOAR residuals quantized with the SAME codebooks
            # (scann_build.cuh:214-223)
            soar_res = np.asarray(x - centers[soar])
            codes_soar = np.asarray(q.pq_transform(pqq, soar_res))

    bf16_ds = (
        np.asarray(x.astype(jnp.bfloat16)) if params.reordering_bf16 else None
    )
    return Index(
        centers=np.asarray(centers),
        labels=np.asarray(labels),
        soar_labels=soar,
        codes=codes,
        pq_codebooks=books,
        residuals_bf16=res_bf16,
        codes_soar=codes_soar,
        bf16_dataset=bf16_ds,
        params=params,
    )


def serialize(index: Index, directory: str) -> None:
    """Write the index as a ScaNN asset directory with the EXACT layout of
    the reference (scann_serialize.cuh:106-142): per-asset .npy files plus
    ``cuvs_metadata.bin`` (raw little-endian scalars: i32 version=1,
    u32 dim, u32 pq_dim). The reference notes these assets are consumed
    by OSS ScaNN / an external proto-conversion tool; labels and
    quantized vectors load directly.

    * ``centers.npy``              — [n_lists, d] f32 partition centers
    * ``datapoint_to_token.npy``   — i32 [2n] interleaved (primary, soar)
      with soar = -1 when equal to primary (save_labels semantics,
      scann_serialize.cuh:56-89)
    * ``pq_codebook.npy``          — PQ codebooks, f32
    * ``hashed_dataset.npy``       — u8 [n, pq_dim] residual codes
    * ``hashed_dataset_soar.npy``  — u8 [n, pq_dim] SOAR-residual codes
    * ``bf16_dataset.npy``         — i16 [n, d] bf16 bit patterns (only
      when built with reordering_bf16, scann.hpp:70-71)
    A ``scann_config.json`` manifest is written alongside for this
    library's own round-trip (the reference tool ignores extra files).
    """
    import struct

    os.makedirs(directory, exist_ok=True)
    n = index.size
    d = index.centers.shape[1]
    pq_dim = 0 if index.pq_codebooks is None else index.pq_codebooks.shape[0]
    with open(os.path.join(directory, "cuvs_metadata.bin"), "wb") as f:
        f.write(struct.pack("<iII", 1, d, pq_dim))

    np.save(os.path.join(directory, "centers.npy"),
            np.asarray(index.centers, np.float32))

    prim = np.asarray(index.labels, np.int32)
    soar = (np.asarray(index.soar_labels, np.int32)
            if index.soar_labels is not None else prim.copy())
    soar = np.where(soar == prim, np.int32(-1), soar)
    combined = np.empty((2 * n,), np.int32)
    combined[0::2] = prim
    combined[1::2] = soar
    np.save(os.path.join(directory, "datapoint_to_token.npy"), combined)

    if index.codes is not None:
        np.save(os.path.join(directory, "pq_codebook.npy"),
                np.asarray(index.pq_codebooks, np.float32))
        np.save(os.path.join(directory, "hashed_dataset.npy"),
                np.asarray(index.codes, np.uint8))
        cs = index.codes_soar if index.codes_soar is not None else index.codes
        np.save(os.path.join(directory, "hashed_dataset_soar.npy"),
                np.asarray(cs, np.uint8))
    if index.bf16_dataset is not None:
        np.save(os.path.join(directory, "bf16_dataset.npy"),
                np.asarray(index.bf16_dataset).view(np.uint16).astype(np.int16))
    if index.residuals_bf16 is not None:
        np.save(os.path.join(directory, "bf16_residuals.npy"),
                np.asarray(index.residuals_bf16, np.float32))
    manifest = {
        "format": "cuvs_tpu.scann.v2",
        "n_lists": int(index.centers.shape[0]),
        "dim": int(d),
        "n_rows": int(n),
        "metric": int(index.params.metric),
        "soar_lambda": index.params.soar_lambda,
        "partitioning_eta": index.params.partitioning_eta,
        "pq_bits": index.params.pq_bits,
        "seed": index.params.seed,
        "has_soar": index.soar_labels is not None,
        "reordering_bf16": index.bf16_dataset is not None,
    }
    with open(os.path.join(directory, "scann_config.json"), "w") as f:
        json.dump(manifest, f, indent=2)


def deserialize(directory: str) -> Index:
    """Read a ScaNN asset directory written by :func:`serialize` back into
    an :class:`Index` (round-trip verification; the same assets are
    loadable by the reference's external conversion tooling)."""
    import ml_dtypes

    with open(os.path.join(directory, "scann_config.json")) as f:
        manifest = json.load(f)
    if manifest.get("format") not in ("cuvs_tpu.scann.v1", "cuvs_tpu.scann.v2"):
        raise ValueError("not a cuvs_tpu scann asset directory")

    def opt(name):
        p = os.path.join(directory, name)
        return np.load(p) if os.path.exists(p) else None

    centers = np.load(os.path.join(directory, "centers.npy"))
    combined = np.load(os.path.join(directory, "datapoint_to_token.npy"))
    labels = combined[0::2]
    soar = combined[1::2].copy()
    has_soar = manifest.get("has_soar", bool((soar >= 0).any()))
    soar = np.where(soar < 0, labels, soar) if has_soar else None
    codes = opt("hashed_dataset.npy")
    codes_soar = opt("hashed_dataset_soar.npy")
    books = opt("pq_codebook.npy")
    res_bf16 = opt("bf16_residuals.npy")
    bf16_ds = opt("bf16_dataset.npy")
    if bf16_ds is not None:
        bf16_ds = bf16_ds.astype(np.int16).view(np.uint16).view(ml_dtypes.bfloat16)
    params = IndexParams(
        n_lists=manifest["n_lists"],
        metric=DistanceType(manifest["metric"]),
        partitioning_eta=manifest["partitioning_eta"],
        soar_lambda=manifest["soar_lambda"],
        spilling=soar is not None,
        pq_bits=manifest.get("pq_bits", 8),
        bf16_residuals=res_bf16 is not None,
        reordering_bf16=bf16_ds is not None,
        seed=manifest.get("seed", 0),
    )
    return Index(
        centers=centers,
        labels=labels,
        soar_labels=soar,
        codes=codes,
        pq_codebooks=books,
        residuals_bf16=res_bf16,
        codes_soar=codes_soar,
        bf16_dataset=bf16_ds,
        params=params,
    )
